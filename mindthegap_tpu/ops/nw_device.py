"""Pallas TPU wavefront kernel for Needleman-Wunsch identity.

The NW recurrence has a sequential row dependency that XLA cannot
vectorize; the classic TPU-shaped answer is an anti-diagonal wavefront:
cells on diagonal d = i + j depend only on diagonals d-1 and d-2, so each
step is one vector op over the whole diagonal, and only three diagonals
live in VMEM at a time (O(n) memory for an O(n*m) DP).

Semantics are the reference's exactly (src/Utils.cpp:87-189 via ops/nw.py):
gap -5, mismatch -5, match +10, identity = traceback matches / max(n, m)
with diagonal > up > left preference. The traceback is emulated forward by
carrying, per cell, the match count along the path the backward traceback
would take (its decisions are local, so a forward selection reproduces it).

Batched: one grid program per pair; pairs are padded to a common buffer
size. Used for device-side dedup of long gap-fill solutions and as the
`nwalign --device` engine; the native C++ rolling DP (native/nw.cpp)
remains the host default for short pairs.
"""

from __future__ import annotations

from functools import partial

import numpy as np

GAP = -5
MIS = -5
MATCH = 10
_NEG = -(1 << 28)
_SENT_A = -8  # sentinel codes: never equal
_SENT_B = -9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(lens_ref, a_ref, bp_ref, out_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    n = lens_ref[g, 0]
    m = lens_ref[g, 1]
    wi = a_ref.shape[2]

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, wi), 1)
    ap = a_ref[0]

    def body(d2_ref, d1_ref, f2_ref, f1_ref):
        d2_ref[:] = jnp.where(iota == 0, jnp.int32(0), jnp.int32(_NEG))
        d1_ref[:] = jnp.where(iota <= 1, jnp.int32(GAP), jnp.int32(_NEG))
        f2_ref[:] = jnp.zeros((1, wi), jnp.int32)
        f1_ref[:] = jnp.zeros((1, wi), jnp.int32)

        def step(d, _):
            d2 = d2_ref[:]
            d1 = d1_ref[:]
            f2 = f2_ref[:]
            f1 = f1_ref[:]
            # b char facing lane i on diagonal d: bp[wi + m - d + i].
            # Lane-dim dynamic loads must be 128-aligned: load the aligned
            # superset and rotate the residual offset away.
            start = (jnp.int32(wi) + m - d).astype(jnp.int32)
            sa = pl.multiple_of(
                ((start // jnp.int32(128)) * jnp.int32(128)).astype(jnp.int32), 128
            )
            chunk = bp_ref[0, 0, pl.ds(sa, wi + 128)][None, :]
            off = (start - sa).astype(jnp.int32)
            # dynamic_rotate requires a non-negative shift: rotate right by
            # width-off == rotate left by off (off == 0 stays put)
            w = jnp.int32(wi + 128)
            shift = jnp.where(off == 0, jnp.int32(0), w - off)
            bs = pltpu.roll(chunk, shift, 1)[:, :wi]
            eq = ap == bs
            sub = jnp.where(eq, jnp.int32(MATCH), jnp.int32(MIS))
            d2m = pltpu.roll(d2, jnp.int32(1), 1)
            f2m = pltpu.roll(f2, jnp.int32(1), 1)
            d1m = pltpu.roll(d1, jnp.int32(1), 1)
            f1m = pltpu.roll(f1, jnp.int32(1), 1)
            diag = d2m + sub
            up = d1m + jnp.int32(GAP)
            left = d1 + jnp.int32(GAP)
            s = jnp.maximum(diag, jnp.maximum(up, left))
            f = jnp.where(
                s == diag, f2m + eq.astype(jnp.int32), jnp.where(s == up, f1m, f1)
            )
            # borders: (0, d) while d <= m; (d, 0) while d <= n
            is_b0 = (iota == 0) & (d <= m)
            is_bd = (iota == d) & (d <= n)
            border = is_b0 | is_bd
            s = jnp.where(border, jnp.int32(GAP) * d, s)
            f = jnp.where(border, jnp.int32(0), f)
            # invalid lanes (i > d or j = d - i outside [0, m]) poisoned
            invalid = (iota > d) | (d - iota > m)
            s = jnp.where(invalid, jnp.int32(_NEG), s)
            d2_ref[:] = d1
            f2_ref[:] = f1
            d1_ref[:] = s
            f1_ref[:] = f
            return _

        jax.lax.fori_loop(2, n + m + 1, step, jnp.int32(0))
        # float32 masked sum: jnp.sum on int32 promotes to int64 under
        # x64, which Mosaic cannot lower; f < 2^24 so f32 is exact
        matches = jnp.sum(jnp.where(iota == n, f1_ref[:].astype(jnp.float32), jnp.float32(0)))
        out_ref[0, 0, 0] = matches.astype(jnp.int32)

    pl.run_scoped(
        body,
        d2_ref=pltpu.VMEM((1, wi), jnp.int32),
        d1_ref=pltpu.VMEM((1, wi), jnp.int32),
        f2_ref=pltpu.VMEM((1, wi), jnp.int32),
        f1_ref=pltpu.VMEM((1, wi), jnp.int32),
    )


def nw_matches_batch(a_codes: np.ndarray, b_codes: np.ndarray, lens: np.ndarray,
                     interpret: bool = False):
    """Traceback match counts for B padded pairs.

    a_codes: (B, Wi) int32 with a[i-1] at lane i (lane 0 = sentinel).
    b_codes: (B, Wb) int32 'bp' buffers (reversed b at offset Wi).
    lens:    (B, 2) int32 true (n, m).
    Returns (B,) int32 match counts."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Wi = a_codes.shape
    Wb = b_codes.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, Wi), lambda g, lens: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Wb), lambda g, lens: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda g, lens: (g, 0, 0), memory_space=pltpu.SMEM),
    )
    # the package enables jax_enable_x64 globally, but Mosaic has no 64-bit
    # support (index-map literals lower as i64 and fail to legalize); every
    # buffer here is int32, so scope x64 off around the call
    with jax.enable_x64(False):
        fn = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            interpret=interpret,
        )
        out = fn(jnp.asarray(lens, jnp.int32),
                 jnp.asarray(a_codes, jnp.int32).reshape(B, 1, Wi),
                 jnp.asarray(b_codes, jnp.int32).reshape(B, 1, Wb))
        return np.asarray(out)[:, 0, 0]


def _prep_pair(a: str, b: str, Wi: int, Wb: int):
    n, m = len(a), len(b)
    ap = np.full(Wi, _SENT_A, np.int32)
    ap[1 : n + 1] = np.frombuffer(a.encode(), np.uint8).astype(np.int32)
    bp = np.full(Wb, _SENT_B, np.int32)
    br = np.frombuffer(b.encode(), np.uint8)[::-1].astype(np.int32)
    bp[Wi : Wi + m] = br
    return ap, bp


def nw_identity_device(pairs, interpret: bool = False):
    """Identities for a list of (a, b) string pairs, batched on device.

    Pads all pairs to shared buffer sizes (one compile per size class)."""
    pairs = list(pairs)
    if not pairs:
        return np.zeros(0, np.float64)
    n_max = max(len(a) for a, _ in pairs)
    m_max = max(len(b) for _, b in pairs)
    if n_max == 0 or m_max == 0:
        return np.array([0.0 for _ in pairs])
    Wi = _round_up(n_max + 1, 128)
    Wb = _round_up(Wi + m_max + Wi + 256, 128)
    B = len(pairs)
    a_codes = np.empty((B, Wi), np.int32)
    b_codes = np.empty((B, Wb), np.int32)
    lens = np.empty((B, 2), np.int32)
    for i, (a, b) in enumerate(pairs):
        a_codes[i], b_codes[i] = _prep_pair(a, b, Wi, Wb)
        lens[i] = (len(a), len(b))
    matches = nw_matches_batch(a_codes, b_codes, lens, interpret=interpret)
    return matches / np.maximum(lens[:, 0], lens[:, 1]).astype(np.float64)
