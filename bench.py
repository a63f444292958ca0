#!/usr/bin/env python3
"""Benchmark: find-scan plane throughput on the local accelerator.

Measures the flagship device pass — the `find` hot loop (per reference base:
1 canonical membership probe + 8 neighbor probes for degrees + 2 repeat-set
probes, reference src/FindBreakpoints.hpp:560-622 / SURVEY.md §3.1) — on a
human-scale synthetic instance, and compares against the single-core numpy
host oracle (the faithful reimplementation of the reference's sequential
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
    import jax
    import jax.numpy as jnp

    from mindthegap_tpu.find import scan
    from mindthegap_tpu.find.scan_device import scan_planes_device

    k = 31
    rng = np.random.default_rng(42)

    # synthetic instance: ~16M solid kmers (a bacterial-to-small-genome scale
    # read set), 4 Mbase reference window set
    n_solid = 1 << 24
    n_repeat = 1 << 20
    window = 1 << 22
    solid = np.sort(rng.integers(0, 1 << 62, size=n_solid, dtype=np.uint64))
    repeat = np.sort(rng.integers(0, 1 << 60, size=n_repeat, dtype=np.uint64))
    codes = rng.integers(0, 4, size=window, dtype=np.uint8)

    solid_d = jnp.asarray(solid)
    repeat_d = jnp.asarray(repeat)
    codes_d = jnp.asarray(codes)

    # compile + warm up
    out = scan_planes_device(codes_d, solid_d, repeat_d, k)
    jax.block_until_ready(out)

    iters = 5
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = scan_planes_device(codes_d, solid_d, repeat_d, k)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    device_bases_per_s = window / best

    # single-core numpy oracle on a slice, extrapolated
    slice_n = 1 << 18
    t0 = time.perf_counter()
    scan.compute_planes(codes[:slice_n], k, solid, repeat)
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
