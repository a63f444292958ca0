"""Differential test: the native C++ automaton must reproduce the python
automaton's output byte-for-byte (the python one is the gate-verified
oracle)."""

import subprocess

import pytest

REF = "/root/reference"


def run_find(tmp, out, automaton, extra=(), engine="host"):
    r = subprocess.run(
        ["python3", "bin/MindTheGap", "find",
         "-in", f"{REF}/data/reads_r1.fastq,{REF}/data/reads_r2.fastq",
         "-ref", f"{REF}/data/reference.fasta",
         "-out", f"{tmp}/{out}", "-automaton", automaton, "-scan-engine", engine,
         *extra],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r


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
@pytest.mark.parametrize(
    "engine,extra",
    [
        ("device-qp", ()),
        ("device-qp", ("-bed", f"{REF}/test/full_test/gold.bed")),
        ("sharded", ()),
        ("device", ("-kmer-size", "45", "-abundance-min", "3")),
        ("sharded", ("-kmer-size", "45", "-abundance-min", "3")),
    ],
    ids=["qp", "qp-bed", "sharded", "span", "sharded-span"],
)
def test_packed_pay_feed_matches_planes(tmp_path, engine, extra):
    """The packed-payload native path (device payload stream fed straight
    into the C automaton, find/runner.py _make_pay_feed_fn +
    native/automaton.cpp scanner_feed_pay) must be byte-identical to the
    plane path over the same engine family — covering the qp pair map
    (k<=32), the span map (k>32), BED restriction, and the mesh-sharded
    dispatchers."""
    from mindthegap_tpu.find import native_scan

    assert native_scan.available(), "native automaton failed to build"
    tmp = str(tmp_path)
    run_find(tmp, "pl", "python", extra, engine="host")
    r = run_find(tmp, "pay", "native", extra, engine=engine)
    assert "using plane path" not in r.stderr, r.stderr
    assert open(f"{tmp}/pl.breakpoints").read() == open(f"{tmp}/pay.breakpoints").read()
    assert _records(f"{tmp}/pl.othervariants.vcf") == _records(f"{tmp}/pay.othervariants.vcf")


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
