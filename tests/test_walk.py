"""Fill traversal point-query layer + device-batched run walker.

Covers the QMap-backed GraphView (fill/traversal.py) against brute-force
set semantics, and (further down) the lockstep device walker
(fill/walk_device.py) against the host traverse_right oracle.
"""

import numpy as np
import pytest

from mindthegap_tpu.fill.traversal import GraphView
from mindthegap_tpu.graph.dbg import Graph, SolidSet
from mindthegap_tpu.ops import kmers as K
from mindthegap_tpu.ops.span import canonical_int


def random_graph(k: int, n_paths: int, path_len: int, seed: int) -> Graph:
    """Solid set made of overlapping random walks (realistic chain structure
    with occasional branching where walks collide)."""
    rng = np.random.default_rng(seed)
    kmers = []
    for _ in range(n_paths):
        codes = rng.integers(0, 4, size=path_len + k - 1, dtype=np.uint8)
        fwd, _ = K.kmers_from_codes(codes, k)
        kmers.append(K.canonical_u64(fwd, k))
    solid = np.unique(np.concatenate(kmers))
    return Graph(SolidSet(solid, k, np.ones(solid.size, np.int64)))


@pytest.mark.parametrize("k", [11, 21, 31])
def test_graphview_matches_bruteforce(k):
    g = random_graph(k, 8, 200, seed=k)
    view = GraphView(g)
    solid_set = set(int(x) for x in g.solid.keys)

    def brute_contains(fwd):
        return canonical_int(fwd, k) in solid_set

    mask = (1 << (2 * k)) - 1
    shift = 2 * (k - 1)
    rng = np.random.default_rng(7)
    # all solid kmers (fwd orientation) + random probes
    probes = [int(x) for x in g.solid.keys[:500]]
    probes += [int(x) for x in rng.integers(0, 1 << (2 * k), size=200, dtype=np.uint64)]
    for fwd in probes:
        assert view.contains_fwd(fwd) == brute_contains(fwd), hex(fwd)
        succs = tuple(
            (nt, ((fwd << 2) | nt) & mask)
            for nt in range(4)
            if brute_contains(((fwd << 2) | nt) & mask)
        )
        preds = tuple(
            (nt, (fwd >> 2) | (nt << shift))
            for nt in range(4)
            if brute_contains((fwd >> 2) | (nt << shift))
        )
        assert view.successors(fwd) == succs
        assert view.predecessors(fwd) == preds


def test_graphview_span_fallback():
    # k > 32 uses binary-search point queries; same answers as brute force
    from mindthegap_tpu.ops.span import Span

    k = 45
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=400, dtype=np.uint8)
    sp = Span(k)
    rows, _valid = sp.from_codes(codes)
    canon = sp.canonical(rows)
    keys = np.unique(sp.keys(canon))
    g = Graph(SolidSet(keys, k, np.ones(keys.size, np.int64)))
    view = GraphView(g)
    ints = set(sp.to_ints(sp.from_keys(keys)).tolist())

    mask = (1 << (2 * k)) - 1
    # walk along the source sequence: every kmer must be contained with its
    # true successor present
    x = 0
    for c in codes[:k]:
        x = (x << 2) | int(c)
    assert view.contains_fwd(x)
    for c in codes[k : k + 50]:
        nxt = ((x << 2) | int(c)) & mask
        assert (int(c), nxt) in view.successors(x)
        assert canonical_int(nxt, k) in ints
        x = nxt


def test_edge_terminator_orientation_algebra():
    """EdgeTerminator (the GATB BranchingTerminator edge-bitmask model,
    docs/PARITY.md round-4 attempt): marking an edge from one orientation
    must be visible from the reverse-complement orientation of the same
    edge, and node-delegated marks must land on branching neighbors only."""
    from mindthegap_tpu.fill.traversal import EdgeTerminator, TraversalPolicy
    from mindthegap_tpu.utils import dna

    rng = np.random.default_rng(11)
    k = 9
    codes = rng.integers(0, 4, size=4000, dtype=np.uint8)
    fwd, _ = K.kmers_from_codes(codes, k)
    keys = np.unique(K.canonical_u64(fwd, k))
    g = Graph(SolidSet(keys, k, np.ones(keys.size, np.int64)))
    view = GraphView(g)
    term = EdgeTerminator(view)

    mask = (1 << (2 * k)) - 1
    n_checked = 0
    for i in rng.integers(0, fwd.size - 1, size=400):
        u = int(fwd[i])
        for nt, v in view.successors(u):
            if not (view.is_branching(u) or view.is_branching(v)):
                continue
            term.masks.clear()
            term.mark_edge(u, nt)
            assert term.is_marked_edge(u, nt)
            # the same edge seen from the reverse strand: rc(v) --top(u)^2--> rc(u)
            ru = K.revcomp_u64(np.array([u], np.uint64), k)[0]
            rv = K.revcomp_u64(np.array([v], np.uint64), k)[0]
            rnt = ((u >> (2 * (k - 1))) & 3) ^ 2
            assert ((int(rv) << 2) | rnt) & mask == int(ru)
            assert term.is_marked_edge(int(rv), rnt)
            n_checked += 1
    assert n_checked > 10


def test_edge_marks_policy_runs_and_matches_defaults_on_simple_graph():
    """On a branch-free graph the edge-mark model must agree exactly with
    the calibrated node-mark model (marks only matter at branchings)."""
    from mindthegap_tpu.fill.traversal import TraversalPolicy, construct_linear_seqs

    rng = np.random.default_rng(3)
    k = 21
    codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
    fwd, _ = K.kmers_from_codes(codes, k)
    keys = np.unique(K.canonical_u64(fwd, k))
    g = Graph(SolidSet(keys, k, np.ones(keys.size, np.int64)))
    L = "".join("ACTG"[c] for c in codes[:k])
    a = construct_linear_seqs(g, L, "", 2000, 50, True, TraversalPolicy())
    b = construct_linear_seqs(g, L, "", 2000, 50, True, TraversalPolicy(edge_marks=True))
    assert a == b and len(a) >= 1
