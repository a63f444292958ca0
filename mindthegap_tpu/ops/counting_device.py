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
        # TWO staging buffers, used alternately: the dispatched program may
        # alias its input numpy buffer zero-copy AND run asynchronously
        # (jnp.array's copy is not synchronous on every backend — the
        # original flush race), so a buffer is only reused after the merge
        # of ITS program has materialized (which synchronizes it). One
        # flush stays in flight: batch g's result transfer (~0.35 s through
        # a remote relay) overlaps batch g+1's compute.
        self._bufs = [np.full(self._batch, SEP, np.uint8) for _ in range(2)]
        self._cur = 0
        self._fill = 0
        self._sorted = np.zeros(0, np.uint64)
        self._counts = np.zeros(0, np.int64)
        self._pending = None

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

    @property
    def _buf(self):
        return self._bufs[self._cur]

    def _flush(self):
        if self._fill == 0:
            return
        buf = self._bufs[self._cur]
        buf[self._fill :] = SEP
        # fused device extract+sort+RLE; only the distinct prefix crosses
        # the host boundary (~1/coverage of the raw k-mer stream). The
        # dispatched program may alias `buf` zero-copy and run async —
        # NEVER touch `buf` again until its merge has materialized.
        dispatched = count_batch_device(jnp.asarray(buf), self.k)
        prev, self._pending = self._pending, dispatched
        self._cur ^= 1
        self._fill = 0
        if prev is not None:
            # blocks until the in-flight program that read the buffer we
            # are switching TO has finished — only then is it reusable
            self._merge_done(prev)
        self._bufs[self._cur][:] = SEP

    def _merge_done(self, triple):
        keys_d, counts_d, nd_d = triple
        nd = int(nd_d)
        if nd == 0:
            return
        u = np.asarray(keys_d[:nd])
        c = np.asarray(counts_d[:nd]).astype(np.int64)
        self._sorted, self._counts = _merge_runs(self._sorted, self._counts, u, c)

    def result(self):
        from .counting import HISTOGRAM_MAX, CountResult

        self._flush()
        if self._pending is not None:
            self._merge_done(self._pending)
            self._pending = None
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


@partial(jax.jit, static_argnames=("k",))
def count_batch_device(codes, k: int):
    """One fused device program: extract + canonicalize + sort + run-length
    encode. Returns (keys u64[P], counts i32[P], n_distinct i32) with the
    distinct keys compacted into the first n_distinct slots (SENTINEL
    padding after) — so the host transfers only the distinct prefix, which
    at real read coverage c is ~1/c of the raw k-mer stream.

    The compaction is scatter-free: a second lax.sort with key
    (is_run_start DESC, key ASC) moves run starts (already in key order) to
    the front, carrying their positions; counts are position differences.
    TPU sort throughput measured ~140M u64 keys/s — the pass is dominated
    by the two sorts, not the RLE."""
    from ..find.scan_device import rolling_kmers_device

    fwd, valid = rolling_kmers_device(codes, k)
    canon = jnp.where(valid, K.canonical_u64(fwd, k, jnp), SENTINEL)
    s = jnp.sort(canon)
    n = s.shape[0]
    n_valid = jnp.sum((s != SENTINEL).astype(jnp.int32))
    newrun = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]]) & (s != SENTINEL)
    n_distinct = jnp.sum(newrun.astype(jnp.int32))
    notstart = (~newrun).astype(jnp.uint8)
    pos = jnp.arange(n, dtype=jnp.int32)
    _, keys_c, pos_c = jax.lax.sort((notstart, s, pos), num_keys=2)
    # run starts occupy the first n_distinct slots in key order; count of
    # run i = next start position - its own (tail closed by n_valid)
    pos_next = jnp.concatenate([pos_c[1:], jnp.zeros(1, jnp.int32)])
    in_prefix = jnp.arange(n, dtype=jnp.int32) < n_distinct
    nxt = jnp.where(jnp.arange(n, dtype=jnp.int32) == n_distinct - 1, n_valid, pos_next)
    counts = jnp.where(in_prefix, nxt - pos_c, 0)
    keys_out = jnp.where(in_prefix, keys_c, SENTINEL)
    return keys_out, counts, n_distinct
