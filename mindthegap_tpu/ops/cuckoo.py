"""Cuckoo-hash membership structure for k-mer sets on TPU.

Why: the de Bruijn graph's `contains` is the find/fill hot probe (11 probes
per reference base, SURVEY.md §3.1). A sorted-array binary search costs
~log2(N) dependent 64-bit gathers per probe; on TPU, HBM gathers are the
bottleneck, so the membership structure must minimize gather count. A
3-hash cuckoo table with a tiny broadcast-compare stash answers a probe in
at most 3 table gathers (each one u64), all independent (pipelineable),
~8x fewer memory touches than the binary search — while staying exact
(unlike the reference's Bloom+cFP which tolerates residual FPs,
reference src/Finder.cpp:243-246).

Build is host-side and vectorized: greedy first-writer-wins placement over
the 3 hash functions for a few rounds, remaining keys go to the stash
(load factor 0.4 keeps the stash tiny). Empty slots hold a sentinel that is
not a valid k-mer for k <= 31 (for k = 32 a real key equal to the sentinel
would be mis-stored; the builder detects this and moves it to the stash).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)

# odd multiplicative constants (splitmix64 / murmur finalizer style)
_HASH_CONSTS = (
    np.uint64(0x9E3779B97F4A7C15),
    np.uint64(0xC2B2AE3D27D4EB4F),
    np.uint64(0xD6E8FEB86659FD93),
)


def _hash(keys, const, log_size: int, xp=np):
    h = (keys ^ (keys >> np.uint64(33))) * const
    h = h ^ (h >> np.uint64(29))
    return (h >> np.uint64(64 - log_size)).astype(xp.uint32 if xp is not np else np.uint32)


@dataclass
class CuckooTable:
    table: np.ndarray  # u64 [S]
    stash: np.ndarray  # u64 [<=64], sorted
    log_size: int

    @property
    def nbytes(self):
        return self.table.nbytes + self.stash.nbytes


def build(keys: np.ndarray, load_factor: float = 0.4, max_rounds: int = 200) -> CuckooTable:
    """Vectorized parallel-cuckoo build with eviction: every pending key
    writes itself to its current-choice slot (first writer per slot wins);
    displaced occupants re-enter the pending set with their next hash
    choice. Converges w.h.p. at load 0.4 with 3 hash functions."""
    keys = np.asarray(keys, dtype=np.uint64)
    n = max(int(keys.size), 1)
    log_size = max(4, int(np.ceil(np.log2(n / load_factor))))
    size = 1 << log_size
    table = np.full(size, EMPTY, dtype=np.uint64)
    slot_choice = np.zeros(size, dtype=np.uint8)  # which hash placed the occupant

    pending = keys[keys != EMPTY]
    sentinel_keys = keys[keys == EMPTY]
    ptry = np.zeros(pending.size, dtype=np.uint8)
    attempts = np.zeros(pending.size, dtype=np.uint8)

    for _ in range(max_rounds):
        if pending.size == 0:
            break
        slots = np.empty(pending.size, dtype=np.int64)
        for h in range(3):
            m = ptry == h
            if m.any():
                slots[m] = _hash(pending[m], _HASH_CONSTS[h], log_size).astype(np.int64)

        force = attempts >= 3  # cycled every choice: allowed to evict
        # phase a: greedy placement of non-force keys into empty slots
        greedy = ~force & (table[slots] == EMPTY)
        gs = slots[greedy]
        uniq_slots, first_idx = np.unique(gs, return_index=True)
        table[uniq_slots] = pending[greedy][first_idx]
        slot_choice[uniq_slots] = ptry[greedy][first_idx]
        placed = np.zeros(pending.size, dtype=bool)
        placed[np.nonzero(greedy)[0][first_idx]] = True

        # phase b: force keys evict the current occupant of their slot
        evicted_keys = np.zeros(0, np.uint64)
        evicted_try = np.zeros(0, np.uint8)
        fidx = np.nonzero(force)[0]
        if fidx.size:
            fs = slots[fidx]
            uniq_f, first_f = np.unique(fs, return_index=True)
            occupied = table[uniq_f] != EMPTY
            evicted_keys = table[uniq_f][occupied]
            evicted_try = (slot_choice[uniq_f][occupied] + 1) % 3
            table[uniq_f] = pending[fidx][first_f]
            slot_choice[uniq_f] = ptry[fidx][first_f]
            placed[fidx[first_f]] = True

        rest = ~placed
        pending_rest = pending[rest]
        ptry_rest = (ptry[rest] + 1) % 3
        attempts_rest = attempts[rest] + 1
        pending = np.concatenate([pending_rest, evicted_keys])
        ptry = np.concatenate([ptry_rest, evicted_try])
        attempts = np.concatenate([attempts_rest, np.ones(evicted_keys.size, np.uint8)])

    # sequential random-walk cleanup for the (rare) keys the parallel rounds
    # livelocked on; at load 0.4 (3-ary threshold ~0.91) chains are short
    rng = np.random.default_rng(0xC0FFEE)
    still_stuck = []
    for key in pending:
        cur = np.uint64(key)
        choice = 0
        ok = False
        for _ in range(500):
            slot = int(_hash(cur[None], _HASH_CONSTS[choice], log_size)[0])
            if table[slot] == EMPTY:
                table[slot] = cur
                slot_choice[slot] = choice
                ok = True
                break
            cur, table[slot] = table[slot], cur
            old_choice = int(slot_choice[slot])
            slot_choice[slot] = choice
            choice = (old_choice + int(rng.integers(1, 3))) % 3
        if not ok:
            still_stuck.append(int(cur))

    stash = np.sort(np.concatenate([np.array(still_stuck, np.uint64), sentinel_keys]))
    if stash.size > 64:
        raise ValueError(f"cuckoo build left {stash.size} keys unplaced; lower load factor")
    return CuckooTable(table, stash, log_size)


def contains(ct: CuckooTable, keys, xp=np):
    """Vectorized membership. Works under numpy or jax.numpy (pass the
    device-resident table/stash arrays via ct)."""
    keys = xp.asarray(keys, dtype=xp.uint64)
    found = xp.zeros(keys.shape, dtype=bool)
    for const in _HASH_CONSTS:
        h = (keys ^ (keys >> np.uint64(33))) * const
        h = h ^ (h >> np.uint64(29))
        slots = h >> np.uint64(64 - ct.log_size)
        found = found | (ct.table[slots.astype(xp.int64 if xp is not np else np.int64)] == keys)
    for i in range(int(ct.stash.size)):
        found = found | (keys == ct.stash[i])
    return found
