#!/usr/bin/env python3
"""Benchmark: find-scan plane throughput on the local accelerator.

Measures the flagship device pass — the `find` hot loop (per reference base:
canonical membership, fwd-strand in/out degrees, and two (k-1)-mer repeat
bits; reference src/FindBreakpoints.hpp:560-622 / SURVEY.md §3.1) — using
the fused quotient map (mindthegap_tpu/ops/extmap.py QMap, ~2 HBM gathers
per base), on a genome-scale synthetic instance, against the single-core
numpy host oracle (the exact reimplementation of the reference's sequential
probe loop) measured in the same run.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax.numpy as jnp

    from mindthegap_tpu.find import scan
    from mindthegap_tpu.find.scan_device import scan_planes_device_q
    from mindthegap_tpu.ops import extmap as X
    from mindthegap_tpu.ops import kmers as K

    k = 31
    rng = np.random.default_rng(42)

    # synthetic genome; its kmers form the solid set (realistic hit rates)
    genome = rng.integers(0, 4, size=1 << 24, dtype=np.uint8)
    fwd, _ = K.kmers_from_codes(genome, k)
    solid = np.unique(K.canonical_u64(fwd, k))
    repeat = np.unique(K.canonical_u64(fwd[: 1 << 19] & K.kmer_mask(k - 1), k - 1))

    qm = X.build_fused(solid, k, repeat)

    window = genome.shape[0]
    args = (
        jnp.asarray(genome),
        jnp.asarray(qm.slots),
        jnp.asarray(qm.stash_keys),
        jnp.asarray(qm.stash_payload),
        qm.log_size,
        k,
    )

    # compile + warm up (forcing a transfer: async dispatch on this backend
    # does not reliably honor block_until_ready)
    int(jnp.sum(scan_planes_device_q(*args)["nb_in"]))

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        int(jnp.sum(scan_planes_device_q(*args)["nb_in"]))
        best = min(best, time.perf_counter() - t0)
    device_bases_per_s = window / best

    # single-core numpy oracle on a slice
    slice_n = 1 << 19
    t0 = time.perf_counter()
    scan.compute_planes(genome[:slice_n], k, solid, repeat)
    host_t = time.perf_counter() - t0
    host_bases_per_s = slice_n / host_t

    result = {
        "metric": "find_scan_bases_per_s",
        "value": round(device_bases_per_s),
        "unit": "bases/s/chip",
        "vs_baseline": round(device_bases_per_s / host_bases_per_s, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
