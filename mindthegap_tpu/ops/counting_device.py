"""Device-side canonical k-mer counting (the DSK equivalent's hot half).

Graph build is the reference's #1 hot loop (SURVEY.md §3 ranking: DSK
counting over all reads). The host path (ops/counting.py StreamingCounter)
extracts + sorts on CPU; this path moves the per-base work — rolling k-mer
extraction, canonicalization, and the sort — onto the accelerator as one
fused jit program per batch:

  codes[B] (uint8, reads concatenated with 255 separators)
    -> forward k-mers + validity (separator windows invalid)
    -> canonical min(fwd, revcomp)
    -> invalid lanes -> 0xFFFF... sentinel
    -> jnp.sort (bitonic on device)

The host keeps only the merge of sorted runs (ops/counting.py merge), i.e.
the same structure a multi-chip build all-merges — see
parallel/mesh.py distributed_count_step for the sharded version with the
psum histogram all-reduce.

k <= 32 (uint64 lanes). Larger spans use the host counter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import kmers as K

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
SEP = 255  # read separator / invalid base code


@partial(jax.jit, static_argnames=("k",))
def sort_canon_device(codes, k: int):
    """codes u8[B] -> sorted canonical kmers u64[B-k+1] (sentinels last)."""
    from ..find.scan_device import rolling_kmers_device

    fwd, valid = rolling_kmers_device(codes, k)
    canon = K.canonical_u64(fwd, k, jnp)
    canon = jnp.where(valid, canon, SENTINEL)
    return jnp.sort(canon)


class DeviceStreamingCounter:
    """Drop-in for ops/counting.py StreamingCounter (k <= 32): batches of
    base codes are concatenated with separators into fixed-size device
    buffers; each flush extracts+sorts on device and merges the run on host."""

    def __init__(self, k: int, batch_bases: int = 1 << 23):
        assert k <= 32, "device counter: k <= 32 (host counter covers larger spans)"
        self.k = k
        self._batch = int(batch_bases)
        # the mid-read flush rewinds k-1 bases; the per-iteration advance must
        # exceed the rewind or add_codes never progresses
        assert self._batch >= 2 * k, "batch_bases must be >= 2*k"
        self._buf = np.full(self._batch, SEP, np.uint8)
        self._fill = 0
        self._sorted = np.zeros(0, np.uint64)
        self._counts = np.zeros(0, np.int64)

    def add_codes(self, codes: np.ndarray):
        codes = np.asarray(codes, np.uint8)
        pos = 0
        n = codes.size
        while True:
            take = min(n - pos, self._batch - self._fill)
            self._buf[self._fill : self._fill + take] = codes[pos : pos + take]
            self._fill += take
            pos += take
            if pos >= n:
                if self._fill < self._batch:
                    self._buf[self._fill] = SEP  # read boundary
                    self._fill += 1
                else:
                    self._flush()
                return
            # buffer full mid-read: flush, then rewind k-1 bases so the
            # windows spanning the split are counted exactly once
            self._flush()
            pos = max(pos - (self.k - 1), 0)

    def _flush(self):
        if self._fill == 0:
            return
        self._buf[self._fill :] = SEP
        s = np.asarray(sort_canon_device(jnp.asarray(self._buf), self.k))
        self._fill = 0
        self._buf[:] = SEP
        n_real = int(np.searchsorted(s, SENTINEL))
        s = s[:n_real]
        if s.size == 0:
            return
        newrun = np.empty(s.size, bool)
        newrun[0] = True
        newrun[1:] = s[1:] != s[:-1]
        idx = np.flatnonzero(newrun)
        u = s[idx]
        c = np.diff(idx, append=s.size).astype(np.int64)
        self._sorted, self._counts = _merge_runs(self._sorted, self._counts, u, c)

    def result(self):
        from .counting import HISTOGRAM_MAX, CountResult

        self._flush()
        hist = np.zeros(HISTOGRAM_MAX + 1, np.int64)
        clipped = np.minimum(self._counts, HISTOGRAM_MAX)
        np.add.at(hist, clipped, 1)
        return CountResult(self._sorted, self._counts, hist, self.k)


def _merge_runs(sorted_a, counts_a, u, c):
    """Merge two sorted (keys, counts) runs, summing counts of equal keys."""
    if sorted_a.size == 0:
        return u, c
    merged = np.concatenate([sorted_a, u])
    mcounts = np.concatenate([counts_a, c])
    order = np.argsort(merged, kind="stable")
    merged, mcounts = merged[order], mcounts[order]
    uniq_mask = np.empty(merged.size, bool)
    uniq_mask[0] = True
    uniq_mask[1:] = merged[1:] != merged[:-1]
    idx = np.cumsum(uniq_mask) - 1
    out_counts = np.zeros(int(idx[-1]) + 1, np.int64)
    np.add.at(out_counts, idx, mcounts)
    return merged[uniq_mask], out_counts
