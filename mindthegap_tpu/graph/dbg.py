"""De Bruijn graph facade over an exact solid-kmer set.

Replaces GATB-core's Bloom + cascading-debloom + MPHF graph
(call sites: Graph::create/load src/Finder.cpp:266-278, contains
src/FindBreakpoints.hpp:853, in/outdegree src/FindBreakpoints.hpp:707-713,
queryAbundance src/Filler.cpp:978). Membership is exact — a sorted canonical
k-mer array + binary search — which is a strict superset of the reference's
bloom+cFP guarantee and hash-robust (see SURVEY.md §7 hard-part 1).

Host arrays are numpy (the observers make sparse point queries); the find
scan uploads the same arrays to device and probes them vectorized
(mindthegap_tpu/find/scan.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..io.bank import Bank
from ..ops import counting, kmers as K
from ..utils import dna


class SolidSet:
    """Sorted canonical k-mer set with optional abundance values."""

    def __init__(self, kmers_sorted: np.ndarray, k: int, counts: np.ndarray | None = None):
        self.kmers = np.ascontiguousarray(kmers_sorted, dtype=np.uint64)
        self.counts = None if counts is None else np.ascontiguousarray(counts)
        self.k = k

    def __len__(self):
        return int(self.kmers.size)

    def contains_canon(self, canon):
        """Vectorized membership of canonical kmer(s)."""
        canon = np.asarray(canon, dtype=np.uint64)
        idx = np.searchsorted(self.kmers, canon)
        idx = np.minimum(idx, max(len(self.kmers) - 1, 0))
        if len(self.kmers) == 0:
            return np.zeros(canon.shape, bool)
        return self.kmers[idx] == canon

    def contains_fwd(self, fwd):
        return self.contains_canon(K.canonical_u64(np.asarray(fwd, dtype=np.uint64), self.k))

    def abundance_canon(self, canon):
        canon = np.asarray(canon, dtype=np.uint64)
        if len(self.kmers) == 0:
            return np.zeros(canon.shape, np.int64)
        idx = np.searchsorted(self.kmers, canon)
        idx = np.minimum(idx, len(self.kmers) - 1)
        hit = self.kmers[idx] == canon
        return np.where(hit, self.counts[idx], 0)


class Graph:
    """The de Bruijn graph: solid set + abundance + metadata info tree."""

    def __init__(self, solid: SolidSet, info: dict | None = None):
        self.solid = solid
        self.k = solid.k
        self.info = info or {}

    # -- membership ---------------------------------------------------------
    def contains_fwd(self, fwd) -> np.ndarray:
        return self.solid.contains_fwd(fwd)

    def contains_canon(self, canon) -> np.ndarray:
        return self.solid.contains_canon(canon)

    def query_abundance_canon(self, canon):
        return self.solid.abundance_canon(canon)

    # -- degrees ------------------------------------------------------------
    def out_neighbors_fwd(self, fwd):
        """The 4 right-extension kmers of forward-oriented kmer(s): shape (...,4)."""
        fwd = np.asarray(fwd, dtype=np.uint64)
        mask = K.kmer_mask(self.k)
        exts = np.stack(
            [((fwd << np.uint64(2)) | np.uint64(x)) & mask for x in range(4)], axis=-1
        )
        return exts

    def in_neighbors_fwd(self, fwd):
        fwd = np.asarray(fwd, dtype=np.uint64)
        shift = np.uint64(2 * (self.k - 1))
        exts = np.stack(
            [(fwd >> np.uint64(2)) | (np.uint64(x) << shift) for x in range(4)], axis=-1
        )
        return exts

    def outdegree_fwd(self, fwd):
        """#existing out-neighbors of the kmer read in forward orientation
        (Graph::outdegree via node strand, src/FindBreakpoints.hpp:711-714)."""
        return self.solid.contains_fwd(self.out_neighbors_fwd(fwd)).sum(axis=-1)

    def indegree_fwd(self, fwd):
        return self.solid.contains_fwd(self.in_neighbors_fwd(fwd)).sum(axis=-1)

    def nb_branching(self) -> int:
        """Branching nodes: solid nodes with in-degree != 1 or out-degree != 1
        (GATB branching definition, stored as "nb_branching" in getInfo())."""
        km = self.solid.kmers
        if km.size == 0:
            return 0
        ind = self.indegree_fwd(km)
        outd = self.outdegree_fwd(km)
        return int(np.count_nonzero((ind != 1) | (outd != 1)))

    # -- persistence --------------------------------------------------------
    def save(self, path: str):
        """Serialize the graph artifact (the reference's .h5 checkpoint seam,
        src/Finder.cpp:274-279 / src/Filler.cpp:216-226). The format is our
        own (npz container), the file name convention is kept."""
        np.savez_compressed(
            path,
            magic=np.frombuffer(b"MTGTPU01", dtype=np.uint8),
            k=np.int64(self.k),
            kmers=self.solid.kmers,
            counts=self.solid.counts if self.solid.counts is not None else np.zeros(0, np.int64),
            info=np.frombuffer(json.dumps(self.info).encode(), dtype=np.uint8),
        )
        # np.savez appends .npz; keep the exact requested name
        if not path.endswith(".npz") and os.path.exists(path + ".npz"):
            os.replace(path + ".npz", path)

    @staticmethod
    def load(path: str) -> "Graph":
        with np.load(path, allow_pickle=False) as z:
            k = int(z["k"])
            info = json.loads(bytes(z["info"].tobytes()).decode())
            solid = SolidSet(z["kmers"], k, z["counts"])
        return Graph(solid, info)


def build_graph(
    reads_uri: str,
    k: int,
    abundance_min: str | int = "auto",
    abundance_max: int = 2147483647,
) -> Graph:
    """Count reads and build the solid-kmer graph (Graph::create equivalent)."""
    from ..io.bank import iter_codes

    counter = counting.StreamingCounter(k)
    for _hdr, codes in iter_codes(reads_uri):
        counter.add_codes(codes)
    res = counter.result()

    auto = isinstance(abundance_min, str) and abundance_min == "auto"
    if auto:
        cutoff = counting.auto_cutoff(res.histogram)
    else:
        cutoff = int(abundance_min)
    keep = (res.counts >= cutoff) & (res.counts <= abundance_max)
    solid = SolidSet(res.kmers[keep], k, res.counts[keep])
    info = {
        "kmers_nb_solid": int(keep.sum()),
        "thresholds": cutoff,
        "abundance_max": abundance_max,
        "abundance_min_is_auto": bool(auto),
    }
    if auto:
        info["cutoffs_auto.values"] = f"{cutoff} "
    g = Graph(solid, info)
    g.info["nb_branching"] = g.nb_branching()
    return g


def build_repeat_set(ref_uri: str, k_minus_1: int, min_occ: int) -> SolidSet:
    """Canonical (k-1)-mers occurring >= min_occ times in the reference —
    the exact-set stand-in for the reference's repeat Bloom
    (fillRefBloom, src/FindBreakpoints.hpp:955-1009: DSK at kmerSize-1 with
    abundance-min = het_max_occ+1, 12 bits/kmer 8-hash Bloom; our exact set
    removes its ~4e-5 FP rate)."""
    from ..io.bank import iter_codes

    counter = counting.StreamingCounter(k_minus_1)
    for _hdr, codes in iter_codes(ref_uri):
        counter.add_codes(codes)
    res = counter.result()
    keep = res.counts >= min_occ
    return SolidSet(res.kmers[keep], k_minus_1, res.counts[keep])
