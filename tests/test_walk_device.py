"""Device-batched fill walker (fill/walk_device.py) vs the host walk engine.

The walker contract (stop before tips/forks/merges/out-branching successors,
append exactly the uninterrupted simple-path stretch) is what guarantees the
device-driven traversal coroutine reproduces the reference's
IterativeExtensions semantics byte-for-byte — checked here on random graphs
(point parity) and via the golden fill suites (end-to-end parity, both
modes).
"""

import numpy as np
import pytest

from mindthegap_tpu.fill.traversal import GraphView, TraversalPolicy, host_walk
from mindthegap_tpu.fill.walk_device import BatchWalker, run_jobs_batched
from mindthegap_tpu.ops import extmap as X
from mindthegap_tpu.ops import kmers as K

K_SIZE = 15


class _FakeSolid:
    def __init__(self, keys):
        self.keys = keys


class _FakeGraph:
    def __init__(self, keys, k):
        self.k = k
        self.solid = _FakeSolid(keys)


def _random_graph(seed, n_seqs=40, seq_len=300, k=K_SIZE):
    """A DBG from random sequences with enough shared substrings to create
    forks, merges and tips."""
    rng = np.random.default_rng(seed)
    fragments = [rng.integers(0, 4, size=seq_len, dtype=np.uint8) for _ in range(6)]
    all_kmers = []
    for _ in range(n_seqs):
        # stitch random fragment slices so paths share interior sequence
        parts = []
        for _ in range(rng.integers(2, 5)):
            f = fragments[rng.integers(0, len(fragments))]
            s = rng.integers(0, seq_len - 60)
            parts.append(f[s : s + rng.integers(40, 60)])
        codes = np.concatenate(parts)
        fwd, valid = K.kmers_from_codes(codes, k)
        all_kmers.append(K.canonical_u64(fwd[valid], k))
    solid = np.unique(np.concatenate(all_kmers))
    graph = _FakeGraph(solid, k)
    return GraphView(graph), solid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_walker_matches_host(seed):
    view, solid = _random_graph(seed)
    qm = view.qm
    walker = BatchWalker(qm, K_SIZE, steps=16, max_steps=64)

    rng = np.random.default_rng(seed + 100)
    # start nodes: as-read kmers present in the graph (both strands)
    starts = []
    for key in solid[rng.integers(0, solid.size, size=37)]:
        fwd = int(key) if rng.integers(0, 2) else int(K.revcomp_u64(np.uint64(key), K_SIZE))
        starts.append(fwd)
    budgets = [int(b) for b in rng.integers(0, 200, size=len(starts))]

    got = walker.walk_many(list(zip(starts, budgets)))
    for (node, budget), (bases, end, reason) in zip(zip(starts, budgets), got):
        h_bases, h_end, h_reason = host_walk(view, node, budget)
        assert bases == h_bases
        assert end == h_end
        assert reason == h_reason


def test_run_jobs_batched_interleaves():
    view, solid = _random_graph(7)
    walker = BatchWalker(view.qm, K_SIZE, steps=8, max_steps=32)

    def job(start, budget):
        total = []
        node = start
        for _ in range(3):  # chained walks exercise resume-from-end-node
            bases, node, reason = yield ("walk", node, budget)
            total.append((list(bases), node, reason))
            if reason != "budget":
                break
        return total

    rng = np.random.default_rng(11)
    starts = [int(s) for s in solid[rng.integers(0, solid.size, size=9)]]
    gens = [job(s, 13) for s in starts]
    got = run_jobs_batched(gens, walker)

    for s, g in zip(starts, got):
        want = []
        node = s
        for _ in range(3):
            bases, node, reason = host_walk(view, node, 13)
            want.append((list(bases), node, reason))
            if reason != "budget":
                break
        assert g == want


@pytest.mark.slow
def test_full_fill_device_engine(tmp_path):
    """fill -bkpt with -fill-engine device reproduces the gold artifacts."""
    from test_golden import REF, run_cli, seq_lines, vcf_records

    tmp = str(tmp_path)
    run_cli(
        ["find", "-in", f"{REF}/data/reads_r1.fastq,{REF}/data/reads_r2.fastq",
         "-ref", f"{REF}/data/reference.fasta", "-out", f"{tmp}/dev-test", "-nb-cores", "1"],
        tmp,
    )
    run_cli(
        ["fill", "-graph", f"{tmp}/dev-test.h5", "-bkpt", f"{tmp}/dev-test.breakpoints",
         "-out", f"{tmp}/dev-fill", "-fill-engine", "device"],
        tmp,
    )
    assert seq_lines(f"{tmp}/dev-fill.insertions.fasta") == seq_lines(
        f"{REF}/test/full_test/gold.insertions.fasta"
    )
    assert vcf_records(f"{tmp}/dev-fill.insertions.vcf") == vcf_records(
        f"{REF}/test/full_test/gold.insertions.vcf"
    )


@pytest.mark.slow
def test_contig_fill_device_engine(tmp_path):
    """fill -contig with -fill-engine device reproduces the gold GFA."""
    from test_golden import REF, run_cli, seq_lines

    tmp = str(tmp_path)
    run_cli(
        ["fill", "-in", f"{REF}/data/contig-reads.fasta.gz", "-contig", f"{REF}/data/contigs.fasta",
         "-abundance-min", "3", "-out", f"{tmp}/contig-dev", "-fill-engine", "device"],
        tmp,
    )
    assert seq_lines(f"{tmp}/contig-dev.insertions.fasta") == seq_lines(
        f"{REF}/test/contig_test/gold.insertions.fasta"
    )
    assert open(f"{tmp}/contig-dev.gfa").read() == open(f"{REF}/test/contig_test/gold.gfa").read()


@pytest.mark.slow
def test_full_fill_device_qb_engine(tmp_path):
    """fill -bkpt with the single-probe bucket layout (-fill-engine
    device-qb) reproduces the gold artifacts."""
    from test_golden import REF, run_cli, seq_lines, vcf_records

    tmp = str(tmp_path)
    run_cli(
        ["find", "-in", f"{REF}/data/reads_r1.fastq,{REF}/data/reads_r2.fastq",
         "-ref", f"{REF}/data/reference.fasta", "-out", f"{tmp}/qb-test", "-nb-cores", "1"],
        tmp,
    )
    run_cli(
        ["fill", "-graph", f"{tmp}/qb-test.h5", "-bkpt", f"{tmp}/qb-test.breakpoints",
         "-out", f"{tmp}/qb-fill", "-fill-engine", "device-qb"],
        tmp,
    )
    assert seq_lines(f"{tmp}/qb-fill.insertions.fasta") == seq_lines(
        f"{REF}/test/full_test/gold.insertions.fasta"
    )
    assert vcf_records(f"{tmp}/qb-fill.insertions.vcf") == vcf_records(
        f"{REF}/test/full_test/gold.insertions.vcf"
    )
