"""Differential test: the native C++ automaton must reproduce the python
automaton's output byte-for-byte (the python one is the gate-verified
oracle)."""

import subprocess

import pytest

REF = "/root/reference"


def run_find(tmp, out, automaton, extra=()):
    r = subprocess.run(
        ["python3", "bin/MindTheGap", "find",
         "-in", f"{REF}/data/reads_r1.fastq,{REF}/data/reads_r2.fastq",
         "-ref", f"{REF}/data/reference.fasta",
         "-out", f"{tmp}/{out}", "-automaton", automaton, "-scan-engine", "host",
         *extra],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def _records(path):
    return [l for l in open(path) if not l.startswith("#")]


@pytest.mark.slow
@pytest.mark.parametrize("extra", [(), ("-bed", f"{REF}/test/full_test/gold.bed")],
                         ids=["full", "bed"])
def test_native_matches_python(tmp_path, extra):
    from mindthegap_tpu.find import native_scan

    assert native_scan.available(), "native automaton failed to build"
    tmp = str(tmp_path)
    run_find(tmp, "py", "host", extra)
    run_find(tmp, "nat", "native", extra)
    assert open(f"{tmp}/py.breakpoints").read() == open(f"{tmp}/nat.breakpoints").read()
    assert _records(f"{tmp}/py.othervariants.vcf") == _records(f"{tmp}/nat.othervariants.vcf")


@pytest.mark.slow
@pytest.mark.parametrize("k", [45, 64, 96], ids=["k45", "k64", "k96"])
def test_native_matches_python_span(tmp_path, k):
    """Multi-word (k > 32) native scanner vs the python automaton: identical
    record streams. Data: the reference's own reads at larger k (abundance 3
    keeps enough solid kmers at the lower effective coverage)."""
    from mindthegap_tpu.find import native_scan

    assert native_scan.available(), "native automaton failed to build"
    tmp = str(tmp_path)
    extra = ("-kmer-size", str(k), "-abundance-min", "3")
    run_find(tmp, "py", "host", extra)
    run_find(tmp, "nat", "native", extra)
    assert open(f"{tmp}/py.breakpoints").read() == open(f"{tmp}/nat.breakpoints").read()
    assert _records(f"{tmp}/py.othervariants.vcf") == _records(f"{tmp}/nat.othervariants.vcf")
