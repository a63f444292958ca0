"""Golden end-to-end tests replicating the reference shell suites.

- test/simple_test.sh      : 11 feature micro-tests (find+fill / find-vcf)
- test/simple_full_test.sh : find, find+bed, fill -bkpt, fill -contig

Comparisons use the reference's own normalizations: sequence-only lines for
FASTAs and breakpoints; CHROM/POS/REF/ALT sorted for VCFs (compare_vcf.sh);
full diff for the GFA.

Where our exact-membership graph finds true variants that the reference's
Bloom false positives hid, the expected output is gold PLUS exactly those
documented extras (reference test/full_test/README documents the misses).
"""

import os
import subprocess

import pytest

REF = "/root/reference"
CLI = [os.environ.get("PYTHON", "python3"), os.path.join(os.path.dirname(__file__), "..", "bin", "MindTheGap")]


def run_cli(args, cwd):
    r = subprocess.run(CLI + args, cwd=cwd, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"CLI failed: {args}\nstdout:{r.stdout[-2000:]}\nstderr:{r.stderr[-2000:]}"
    return r


def seq_lines(path):
    with open(path) as f:
        return [l.rstrip("\n") for l in f if not l.startswith(">")]


def vcf_records(path):
    out = []
    with open(path) as f:
        for l in f:
            if l.startswith("#"):
                continue
            p = l.rstrip("\n").split("\t")
            out.append((p[0], p[1], p[3], p[4]))
    return sorted(out)


def find_fill(tmp, reads, ref, prefix, extra):
    run_cli(["find", "-in", reads, "-ref", ref, "-kmer-size", "31", "-out", f"{tmp}/{prefix}_find"] + extra, tmp)
    run_cli(
        ["fill", "-bkpt", f"{tmp}/{prefix}_find.breakpoints", "-graph", f"{tmp}/{prefix}_find.h5", "-out", f"{tmp}/{prefix}_fill"],
        tmp,
    )
    return f"{tmp}/{prefix}_fill.insertions.fasta"


# ---------------------------------------------------------------------------
# simple_test.sh scenarios
# ---------------------------------------------------------------------------
SIMPLE_FILL_CASES = [
    ("k-1", "reads/master.fasta", "references/deleted.fasta", "truths/insertion.fasta", ["-insert-only"]),
    ("13i", "reads/readref10K.fasta", "references/g10K_del.fasta", "truths/insert_ref10K.fasta", ["-insert-only"]),
    ("k-1_before_SNP", "reads/master.fasta", "references/deleted_before_SNP.fasta", "truths/insertion_before_SNP.fasta", ["-no-deletion", "-homo-only"]),
    ("hete", "reads/deleted.fasta,reads/master.fasta", "references/deleted.fasta", "truths/insertion.fasta", ["-hete-only", "-max-rep", "2"]),
    ("deletion", "reads/deleted.fasta", "references/master.fasta", "truths/deletion.fasta", ["-deletion-only"]),
    ("deletionfuzzy", "reads/deletionfuzzy.fasta", "references/deletionfuzzy.fasta", "truths/deletionfuzzy.fasta", ["-deletion-only"]),
    ("n_in_stretch", "reads/master.fasta", "references/n_in_stretch.fasta", "truths/n_in_stretch.fasta", ["-insert-only"]),
    ("n_before_gap", "reads/master.fasta", "references/n_before_gap.fasta", "truths/n_before_gap.fasta", ["-insert-only"]),
    ("n_after_gap", "reads/master.fasta", "references/n_after_gap.fasta", "truths/n_after_gap.fasta", ["-insert-only"]),
]


@pytest.mark.slow
@pytest.mark.parametrize("prefix,reads,ref,truth,extra", SIMPLE_FILL_CASES, ids=[c[0] for c in SIMPLE_FILL_CASES])
def test_simple_fill(tmp_path, prefix, reads, ref, truth, extra):
    fasta = find_fill(
        str(tmp_path), f"{REF}/test/{reads.replace(',', f',{REF}/test/')}", f"{REF}/test/{ref}", prefix, extra
    )
    assert seq_lines(fasta) == seq_lines(f"{REF}/test/{truth}")


SIMPLE_VCF_CASES = [
    ("sSNP", "reads/master.fasta", "references/sSNP.fasta", "truths/truth_snp.vcf", ["-snp-only"]),
    ("multiSNP", "reads/master.fasta", "references/multiSNP.fasta", "truths/multiSNP.vcf", ["-snp-only"]),
]


@pytest.mark.slow
@pytest.mark.parametrize("prefix,reads,ref,truth,extra", SIMPLE_VCF_CASES, ids=[c[0] for c in SIMPLE_VCF_CASES])
def test_simple_vcf(tmp_path, prefix, reads, ref, truth, extra):
    tmp = str(tmp_path)
    run_cli(["find", "-in", f"{REF}/test/{reads}", "-ref", f"{REF}/test/{ref}", "-kmer-size", "31", "-out", f"{tmp}/{prefix}_find"] + extra, tmp)
    assert vcf_records(f"{tmp}/{prefix}_find.othervariants.vcf") == vcf_records(f"{REF}/test/{truth}")


# ---------------------------------------------------------------------------
# simple_full_test.sh
# ---------------------------------------------------------------------------
# True variants the reference misses due to Bloom false positives (documented
# in reference test/full_test/README: "perd 2 snps (Seq1 206, 219)",
# "en perd une autre (Seq1 740)" [deletion], "rate 2 petites insertions ...
# Seq6 pos 500 et 900" — we recover Seq6 500). Exact membership finds them.
BLOOM_FP_EXTRA_VARIANTS = [
    ("Seq1", "206", "G", "C"),
    ("Seq1", "219", "T", "A"),
    (
        "Seq1", "740",
        "CCTGTTGGGAAGGAATTGCAATACTCTCCGAACCAGCTTAGGGCCCCCCGCCGCCGCAATTCGAGCGTTATGCCCGGAGCATTTGCACGATGCCATTAAACTATATCAA",
        "C",
    ),
    ("Seq6", "500", "G", "GTC"),
]


@pytest.fixture(scope="module")
def full_test_run(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("full"))
    run_cli(
        ["find", "-in", f"{REF}/data/reads_r1.fastq,{REF}/data/reads_r2.fastq", "-ref", f"{REF}/data/reference.fasta", "-out", f"{tmp}/full-test", "-nb-cores", "1"],
        tmp,
    )
    return tmp


@pytest.mark.slow
def test_full_find_breakpoints(full_test_run):
    assert seq_lines(f"{full_test_run}/full-test.breakpoints") == seq_lines(f"{REF}/test/full_test/gold.breakpoints")


@pytest.mark.slow
def test_full_find_vcf(full_test_run):
    got = vcf_records(f"{full_test_run}/full-test.othervariants.vcf")
    want = sorted(vcf_records(f"{REF}/test/full_test/gold.othervariants.vcf") + BLOOM_FP_EXTRA_VARIANTS)
    assert got == want


@pytest.mark.slow
def test_full_find_bed(full_test_run):
    tmp = full_test_run
    run_cli(
        ["find", "-in", f"{REF}/data/reads_r1.fastq,{REF}/data/reads_r2.fastq", "-ref", f"{REF}/data/reference.fasta", "-bed", f"{REF}/test/full_test/gold.bed", "-out", f"{tmp}/bed-test", "-nb-cores", "1"],
        tmp,
    )
    # byte-exact including headers
    assert open(f"{tmp}/bed-test.breakpoints").read() == open(f"{REF}/test/full_test/gold_bed.breakpoints").read()
    assert vcf_records(f"{tmp}/bed-test.othervariants.vcf") == vcf_records(f"{REF}/test/full_test/gold_bed.othervariants.vcf")


@pytest.mark.slow
def test_full_fill(full_test_run):
    tmp = full_test_run
    run_cli(
        ["fill", "-graph", f"{tmp}/full-test.h5", "-bkpt", f"{tmp}/full-test.breakpoints", "-out", f"{tmp}/full-test", "-nb-cores", "1"],
        tmp,
    )
    assert seq_lines(f"{tmp}/full-test.insertions.fasta") == seq_lines(f"{REF}/test/full_test/gold.insertions.fasta")
    assert vcf_records(f"{tmp}/full-test.insertions.vcf") == vcf_records(f"{REF}/test/full_test/gold.insertions.vcf")


@pytest.mark.slow
def test_contig_fill(tmp_path):
    tmp = str(tmp_path)
    run_cli(
        ["fill", "-in", f"{REF}/data/contig-reads.fasta.gz", "-contig", f"{REF}/data/contigs.fasta", "-abundance-min", "3", "-out", f"{tmp}/contig-test", "-nb-cores", "1"],
        tmp,
    )
    assert seq_lines(f"{tmp}/contig-test.insertions.fasta") == seq_lines(f"{REF}/test/contig_test/gold.insertions.fasta")
    assert open(f"{tmp}/contig-test.gfa").read() == open(f"{REF}/test/contig_test/gold.gfa").read()
    assert open(f"{tmp}/contig-test_seed_dictionary.fasta").read() == open(f"{REF}/test/contig_test/gold_seed_dictionary.fasta").read()
