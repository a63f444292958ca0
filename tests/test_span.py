"""Multi-word k-mer span tests (k > 32) + an end-to-end run at k = 45."""

import subprocess

import numpy as np
import pytest

from mindthegap_tpu.ops.span import Span, canonical_int, revcomp_int
from mindthegap_tpu.ops import counting
from mindthegap_tpu.utils import dna

COMP = str.maketrans("ACGT", "TGCA")


def brute_rc(s):
    return s.translate(COMP)[::-1]


def str2int(s):
    order = {"A": 0, "C": 1, "T": 2, "G": 3}
    v = 0
    for c in s:
        v = (v << 2) | order[c]
    return v


@pytest.mark.parametrize("k", [33, 45, 64, 65, 96, 128])
def test_span_roundtrip(k):
    rng = np.random.default_rng(k)
    seq = "".join(rng.choice(list("ACGT"), size=k + 50))
    sp = Span(k)
    arr, valid = sp.from_codes(dna.seq_to_codes(seq))
    assert valid.all()
    ints = sp.to_ints(arr)
    for i in range(len(seq) - k + 1):
        w = seq[i : i + k]
        assert int(ints[i]) == str2int(w), f"pos {i}"
        # revcomp
        rc_row = sp.revcomp(arr[i : i + 1])
        assert int(sp.to_ints(rc_row)[0]) == str2int(brute_rc(w))
        assert revcomp_int(str2int(w), k) == str2int(brute_rc(w))
        # canonical
        canon = sp.canonical(arr[i : i + 1])
        assert int(sp.to_ints(canon)[0]) == min(str2int(w), str2int(brute_rc(w)))
        assert canonical_int(str2int(w), k) == min(str2int(w), str2int(brute_rc(w)))


def test_span_shifts_and_lowbits():
    k = 45
    sp = Span(k)
    rng = np.random.default_rng(1)
    seq = "".join(rng.choice(list("ACGT"), size=k))
    arr, _ = sp.from_codes(dna.seq_to_codes(seq))
    v = str2int(seq)
    mask = (1 << (2 * k)) - 1
    for x in range(4):
        out = sp.shift_left_insert(arr, x)
        assert int(sp.to_ints(out)[0]) == ((v << 2) | x) & mask
        out = sp.shift_right_insert(arr, x)
        assert int(sp.to_ints(out)[0]) == (v >> 2) | (x << (2 * (k - 1)))
    low = sp.low_bits(arr, k - 1)
    assert int(Span(k - 1).to_ints(low)[0]) == v & ((1 << (2 * (k - 1))) - 1)
    sh = sp.shifted_right2(arr)
    assert int(sp.to_ints(sh)[0]) == v >> 2


def test_counting_span_matches_bruteforce():
    import collections

    rng = np.random.default_rng(9)
    k = 41
    seqs = ["".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=120)) for _ in range(20)]
    c = counting.StreamingCounter(k, batch_kmers=300)
    for s in seqs:
        c.add_codes(dna.seq_to_codes(s))
    res = c.result()
    cnt = collections.Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k]
            if "N" in w:
                continue
            cnt[min(str2int(w), str2int(brute_rc(w)))] += 1
    sp = Span(k)
    got = {int(x): int(ct) for x, ct in zip(sp.to_ints(sp.from_keys(res.kmers)), res.counts)}
    assert got == dict(cnt)


@pytest.mark.slow
def test_e2e_find_fill_k45(tmp_path):
    """Homozygous insertion detected and assembled at k=45 (multi-word span)."""
    rng = np.random.default_rng(123)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    insertion = "".join(rng.choice(list("ACGT"), size=120))
    donor = genome[:1000] + insertion + genome[1000:]
    reads = []
    for _ in range(800):
        i = int(rng.integers(0, len(donor) - 100))
        reads.append(donor[i : i + 100])
    (tmp_path / "reads.fasta").write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    (tmp_path / "ref.fasta").write_text(f">chr1\n{genome}\n")

    cli = ["python3", "bin/MindTheGap"]
    r = subprocess.run(
        cli + ["find", "-in", str(tmp_path / "reads.fasta"), "-ref", str(tmp_path / "ref.fasta"),
               "-kmer-size", "45", "-abundance-min", "3", "-out", str(tmp_path / "t45")],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    bkpts = (tmp_path / "t45.breakpoints").read_text()
    assert "HOM" in bkpts and "pos_1000" in bkpts

    r = subprocess.run(
        cli + ["fill", "-graph", str(tmp_path / "t45.h5"), "-bkpt", str(tmp_path / "t45.breakpoints"),
               "-out", str(tmp_path / "t45")],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    fasta = (tmp_path / "t45.insertions.fasta").read_text().splitlines()
    seqs = [l for l in fasta if not l.startswith(">")]
    assert insertion in seqs, "inserted sequence not assembled at k=45"
