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
