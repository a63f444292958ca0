import numpy as np
import pytest

from mindthegap_tpu.ops import cuckoo


@pytest.mark.parametrize("n", [0, 1, 100, 100000])
def test_build_and_contains(n):
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))
    ct = cuckoo.build(keys)
    if n:
        assert cuckoo.contains(ct, keys).all()
    probes = rng.integers(0, 1 << 62, size=5000, dtype=np.uint64)
    got = cuckoo.contains(ct, probes)
    want = np.isin(probes, keys)
    np.testing.assert_array_equal(got, want)


def test_sentinel_key_goes_to_stash():
    keys = np.array([cuckoo.EMPTY, 5, 7], dtype=np.uint64)
    ct = cuckoo.build(keys)
    assert cuckoo.contains(ct, np.array([cuckoo.EMPTY, 5, 6], dtype=np.uint64)).tolist() == [True, True, False]


def test_jnp_contains_matches():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 1 << 62, size=20000, dtype=np.uint64))
    ct = cuckoo.build(keys)
    probes = np.concatenate([keys[:500], rng.integers(0, 1 << 62, size=500, dtype=np.uint64)])
    host = cuckoo.contains(ct, probes)
    dct = cuckoo.CuckooTable(jnp.asarray(ct.table), jnp.asarray(ct.stash), ct.log_size)
    dev = np.asarray(cuckoo.contains(dct, jnp.asarray(probes), xp=jnp))
    np.testing.assert_array_equal(host, dev)
