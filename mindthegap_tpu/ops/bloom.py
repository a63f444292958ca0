"""Bloom filter over packed uint32 bitset — the probabilistic membership
layer for scale-out modes.

The reference keeps its whole graph behind a Bloom(+cFP) (GATB `dbgh5`,
configured at src/Finder.cpp:243-246: 12 bits/kmer-class defaults; the
reference repeat-bloom uses 24 bits/kmer with 8 hashes,
src/FindBreakpoints.hpp:984-992). Our default graph is exact (SolidSet /
extmap); this Bloom exists for the distributed build path, where per-shard
bitsets are unioned with a bitwise-or all-reduce before the exact structure
is assembled (SURVEY.md §2.3), and as a low-memory prefilter for fill
frontier expansion.

Works under numpy and jax.numpy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_CONSTS = tuple(
    np.uint64(c)
    for c in (
        0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xD6E8FEB86659FD93,
        0xA0761D6478BD642F, 0xE7037ED1A0B428DB, 0x8EBC6AF09C88C6E3,
        0x589965CC75374CC3, 0x1D8E4E27C47D124F,
    )
)


@dataclass
class BloomFilter:
    bits: np.ndarray  # uint32 [W]
    log_bits: int
    n_hash: int

    @property
    def nbytes(self):
        return self.bits.nbytes


def _positions(keys, log_bits: int, n_hash: int):
    out = []
    for c in _CONSTS[:n_hash]:
        h = (keys ^ (keys >> np.uint64(33))) * c
        h = h ^ (h >> np.uint64(29))
        out.append(h >> np.uint64(64 - log_bits))
    return out


def build(keys: np.ndarray, bits_per_key: int = 12, n_hash: int | None = None) -> BloomFilter:
    keys = np.asarray(keys, dtype=np.uint64)
    n = max(int(keys.size), 1)
    log_bits = max(6, int(np.ceil(np.log2(n * bits_per_key))))
    if n_hash is None:
        n_hash = max(1, int(0.7 * bits_per_key))
    n_hash = min(n_hash, len(_CONSTS))
    words = np.zeros(1 << (log_bits - 5), dtype=np.uint32)
    for pos in _positions(keys, log_bits, n_hash):
        w = (pos >> np.uint64(5)).astype(np.int64)
        b = (pos & np.uint64(31)).astype(np.uint32)
        np.bitwise_or.at(words, w, np.left_shift(np.uint32(1), b))
    return BloomFilter(words, log_bits, n_hash)


def contains(bf: BloomFilter, keys, xp=np):
    keys = xp.asarray(keys, dtype=xp.uint64)
    res = xp.ones(keys.shape, dtype=bool)
    for c in _CONSTS[: bf.n_hash]:
        h = (keys ^ (keys >> np.uint64(33))) * c
        h = h ^ (h >> np.uint64(29))
        pos = h >> np.uint64(64 - bf.log_bits)
        w = (pos >> np.uint64(5)).astype(xp.int64 if xp is not np else np.int64)
        b = (pos & np.uint64(31)).astype(xp.uint32)
        res = res & ((bf.bits[w] >> b) & xp.uint32(1)).astype(bool)
    return res


def union(filters: list[BloomFilter]) -> BloomFilter:
    """Bitwise-or merge of shard bitsets (the all-reduce combiner)."""
    out = filters[0].bits.copy()
    for f in filters[1:]:
        assert f.log_bits == filters[0].log_bits and f.n_hash == filters[0].n_hash
        out |= f.bits
    return BloomFilter(out, filters[0].log_bits, filters[0].n_hash)
