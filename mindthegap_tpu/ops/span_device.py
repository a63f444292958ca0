"""Device (jnp) multi-word k-mer arithmetic for 32 < k <= 256.

The reference supports k up to 128/256 via compile-time KSIZE_LIST spans
(reference README.md:172-180). On device a k-mer batch is a stacked
(W, P) uint64 array, word 0 most significant, value right-aligned —
the same layout as the host ops/span.py (value = sum words[i] << 64*(W-1-i)).

All functions are jit-traceable; W and k are static.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import kmers as K1

INVALID = 255

_M1 = np.uint64(0x3333333333333333)
_M2 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M3 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0000FFFF0000FFFF)
_M5 = np.uint64(0x00000000FFFFFFFF)
_COMP = np.uint64(0xAAAAAAAAAAAAAAAA)


def span_width(k: int) -> int:
    return max(1, -(-k // 32))


def top_mask(k: int) -> np.uint64:
    w = span_width(k)
    top_bits = 2 * k - 64 * (w - 1)
    return np.uint64((1 << top_bits) - 1) if top_bits < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_span_device(codes, k: int):
    """Rolling multi-word forward k-mers over a padded window.

    codes: uint8[W] (255 = invalid/padding). Returns (words u64[Wk, P],
    valid bool[P]) with P = len(codes) - k + 1. Word j >= 1 packs bases
    [i + k - 32*(Wk - j) , +32); word 0 packs the leading k - 32*(Wk-1)
    bases."""
    import jax

    n = codes.shape[0]
    p = n - k + 1
    wk = span_width(k)
    bad = codes == INVALID
    c = jnp.where(bad, 0, codes).astype(jnp.uint64)

    def pack(offset: int, nb: int):
        """u64 plane packing nb bases starting at position i+offset."""
        acc = jnp.zeros((p,), jnp.uint64)
        for j in range(nb):
            acc = (acc << jnp.uint64(2)) | jax.lax.dynamic_slice(c, (offset + j,), (p,))
        return acc

    tb = k - 32 * (wk - 1)  # bases in word 0
    words = [pack(0, tb)]
    for j in range(1, wk):
        words.append(pack(tb + 32 * (j - 1), 32))
    badc = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(bad.astype(jnp.int32))])
    valid = (badc[k:] - badc[:-k]) == 0
    return jnp.stack(words), valid


def _revcomp_word_full(x):
    x = x ^ _COMP
    x = ((x >> jnp.uint64(2)) & _M1) | ((x & _M1) << jnp.uint64(2))
    x = ((x >> jnp.uint64(4)) & _M2) | ((x & _M2) << jnp.uint64(4))
    x = ((x >> jnp.uint64(8)) & _M3) | ((x & _M3) << jnp.uint64(8))
    x = ((x >> jnp.uint64(16)) & _M4) | ((x & _M4) << jnp.uint64(16))
    x = ((x >> jnp.uint64(32)) & _M5) | ((x & _M5) << jnp.uint64(32))
    return x


def revcomp_span_device(words, k: int):
    """Reverse complement of (W, P) multi-word k-mers (same layout out)."""
    w = words.shape[0]
    rev = _revcomp_word_full(words[::-1])
    s = 64 * w - 2 * k
    if s:
        su, cu = jnp.uint64(s), jnp.uint64(64 - s)
        out = [rev[0] >> su]
        for i in range(1, w):
            out.append((rev[i] >> su) | (rev[i - 1] << cu))
        rev = jnp.stack(out)
    return rev


def canonical_span_device(words, k: int):
    """(canonical words (W, P), is_canon bool[P]) — min(fwd, revcomp)."""
    rc = revcomp_span_device(words, k)
    w = words.shape[0]
    take_f = jnp.ones(words.shape[1], bool)
    decided = jnp.zeros(words.shape[1], bool)
    for i in range(w):
        lt = words[i] < rc[i]
        gt = words[i] > rc[i]
        take_f = jnp.where(~decided & gt, False, take_f)
        decided = decided | lt | gt
    canon = jnp.where(take_f[None, :], words, rc)
    return canon, take_f


_H3 = np.uint64(0xD6E8FEB86659FD93)


def digest64(words, xp=jnp):
    """64-bit exact-residual digest of (W, P) multi-word keys:
    key64 = w0 ^ G(w1..w_{W-1}). Together with a raw compare of words
    1..W-1, equality of key64 implies equality of the full key (w0 is then
    pinned by xor). Matches the host builder in ops/extmap.py."""
    w = words.shape[0]
    g = None
    for i in range(1, w):
        x = words[i] if g is None else (g ^ words[i])
        h = (x ^ (x >> np.uint64(33))) * _H3
        g = h ^ (h >> np.uint64(29))
    return words[0] if g is None else words[0] ^ g
