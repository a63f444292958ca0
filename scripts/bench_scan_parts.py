#!/usr/bin/env python3
"""Decompose the find-scan device pass into its cost components on the
attached accelerator, to aim optimization at the right part:

  gather8    : one u64 gather stream per position
  gather16   : one (2,) u64 row gather per position (bucket-pair layout probe)
  hash       : the two quotient-map hash mixes per position, no gathers
  rolling    : rolling k-mer + canonical extraction only
  lookup     : full fused lookup_q (2 hash mixes + 2 gathers + stash pass)
  full       : scan_planes_device_q end to end

Usage: python scripts/bench_scan_parts.py [log2_bases]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def timed(fn, *args, n=5):
    import jax.numpy as jnp

    fn(*args)  # compile+warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from mindthegap_tpu.find.scan_device import rolling_kmers_device, scan_planes_device_q
    from mindthegap_tpu.ops import extmap as X
    from mindthegap_tpu.ops import kmers as K

    k = 31
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << lg
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=n, dtype=np.uint8)
    fwd, _ = K.kmers_from_codes(genome, k)
    solid = np.unique(K.canonical_u64(fwd, k))
    repeat = np.unique(K.canonical_u64(fwd[: 1 << 19] & K.kmer_mask(k - 1), k - 1))
    qm = X.build_fused(solid, k, repeat)
    print(f"bases={n} solid={solid.size} slots=2^{qm.log_size}", flush=True)

    codes_d = jnp.asarray(genome)
    slots_d = jnp.asarray(qm.slots)
    slots2_d = jnp.asarray(qm.slots.reshape(-1, 2))
    sk_d = jnp.asarray(qm.stash_keys)
    sv_d = jnp.asarray(qm.stash_payload)
    keys = np.unique(K.canonical_u64(fwd & K.kmer_mask(k - 1), k - 1))
    idx = rng.integers(0, qm.slots.size, size=n, dtype=np.int64)
    idx_d = jnp.asarray(idx)
    idx2_d = jnp.asarray(idx % (qm.slots.size // 2))
    keys_d = jnp.asarray(rng.choice(keys, size=n))

    @jax.jit
    def f_gather8(slots, idx):
        return jnp.sum(slots[idx])

    @jax.jit
    def f_gather16(slots2, idx2):
        return jnp.sum(slots2[idx2])

    @jax.jit
    def f_hash(keys):
        out = jnp.zeros(keys.shape, jnp.uint64)
        for const in (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)):
            h = (keys ^ (keys >> np.uint64(33))) * const
            h = h ^ (h >> np.uint64(29))
            out = out ^ h
        return jnp.sum(out)

    @partial(jax.jit, static_argnames=("kk",))
    def f_rolling(codes, kk):
        q, _v = rolling_kmers_device(codes, kk - 1)
        return jnp.sum(K.canonical_u64(q, kk - 1, jnp))

    @jax.jit
    def f_lookup(keys, slots, sk, sv):
        qmj = X.QMap(slots, qm.log_size, sk, sv)
        return jnp.sum(X.lookup_q(qmj, keys, xp=jnp))

    def f_full(codes, slots, sk, sv):
        return int(jnp.sum(scan_planes_device_q(codes, slots, sk, sv, qm.log_size, k)["nb_in"]))

    # force readbacks: int() of each; print as each completes
    def report(name, fn, *a):
        t = timed(fn, *a)
        print(f"{name:9s} {t*1e3:8.2f} ms  {n/t/1e6:9.1f} M/s", flush=True)

    report("gather8", lambda *a: int(f_gather8(*a)), slots_d, idx_d)
    report("gather16", lambda *a: int(f_gather16(*a)), slots2_d, idx2_d)

    # row-width sweep: [1,W] u64 rows from a [S/W, W] table view — where is
    # the knee between per-row amortization and per-byte cost?
    for w in (4, 8, 16, 32):
        slots_w = jnp.asarray(qm.slots.reshape(-1, w))
        idx_w = jnp.asarray(idx % (qm.slots.size // w))

        @jax.jit
        def f_row(tab, ix):
            return jnp.sum(tab[ix])

        report(f"row{w*8}B", lambda *a: int(f_row(*a)), slots_w, idx_w)
    report("hash", lambda *a: int(f_hash(*a)), keys_d)
    report("rolling", lambda *a: int(f_rolling(*a, kk=k)), codes_d)
    report("lookup", lambda *a: int(f_lookup(*a)), keys_d, slots_d, sk_d, sv_d)
    report("full", lambda *a: f_full(*a), codes_d, slots_d, sk_d, sv_d)


if __name__ == "__main__":
    main()
