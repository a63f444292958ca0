import numpy as np
import pytest

from mindthegap_tpu.io import bank, cbank
from mindthegap_tpu.utils import dna

REF = "/root/reference"

FILES = [
    f"{REF}/data/reads_r1.fastq",
    f"{REF}/data/contigs.fasta",
    f"{REF}/data/contig-reads.fasta.gz",
    f"{REF}/test/reads/master.fasta",
]


@pytest.mark.parametrize("path", FILES, ids=[f.rsplit("/", 1)[-1] for f in FILES])
def test_native_parser_matches_python(path):
    assert cbank.available(), "native fastx parser failed to build"
    parsed = cbank.parse_codes(path)
    assert parsed is not None
    headers, codes, offsets = parsed
    py = list(bank._iter_file(path))
    assert len(py) == len(headers)
    for i, (hdr, seq) in enumerate(py):
        assert headers[i] == hdr
        np.testing.assert_array_equal(codes[offsets[i] : offsets[i + 1]], dna.seq_to_codes(seq))


def test_bank_comma_list_and_fof(tmp_path):
    f1 = tmp_path / "a.fasta"
    f1.write_text(">s1\nACGT\n>s2\nGGTT\n")
    f2 = tmp_path / "b.fasta"
    f2.write_text(">s3\nTTAA\n")
    fof = tmp_path / "list.txt"
    fof.write_text("a.fasta\nb.fasta\n")
    recs = list(bank.Bank.open(f"{f1},{f2}"))
    assert [r.comment for r in recs] == ["s1", "s2", "s3"]
    recs2 = list(bank.Bank.open(str(fof)))
    assert [r.seq for r in recs2] == ["ACGT", "GGTT", "TTAA"]
    assert [r.index for r in recs2] == [0, 1, 2]
