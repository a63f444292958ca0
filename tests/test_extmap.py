import numpy as np
import pytest

from mindthegap_tpu.ops import extmap as X
from mindthegap_tpu.ops import kmers as K
from mindthegap_tpu.utils import dna
from mindthegap_tpu.find import scan


@pytest.fixture(scope="module")
def genome_set():
    rng = np.random.default_rng(11)
    k = 21
    genome = rng.integers(0, 4, size=50000, dtype=np.uint8)
    fwd, _ = K.kmers_from_codes(genome, k)
    solid = np.unique(K.canonical_u64(fwd, k))
    return genome, k, solid


def test_payload_place_lookup():
    rng = np.random.default_rng(2)
    keys = np.unique(rng.integers(0, 1 << 60, size=30000, dtype=np.uint64))
    vals = rng.integers(1, 256, size=keys.size).astype(np.uint8)
    em = X._place(keys, vals, 0.35)
    np.testing.assert_array_equal(X.lookup_payload(em, keys), vals)
    absent = rng.integers(0, 1 << 60, size=5000, dtype=np.uint64)
    mask = ~np.isin(absent, keys)
    assert (X.lookup_payload(em, absent[mask]) == 0).all()


def test_member_table(genome_set):
    _, k, solid = genome_set
    rm = X.build_member(solid)
    assert X.lookup_member(rm, solid).all()
    rng = np.random.default_rng(4)
    probes = rng.integers(0, 1 << (2 * k), size=10000, dtype=np.uint64)
    np.testing.assert_array_equal(X.lookup_member(rm, probes), np.isin(probes, solid))


def test_ext_planes_match_host_oracle(genome_set):
    """The extension-bitmap derivation must reproduce the 11-probe host scan
    exactly (contains, degrees) on genome-like data with Ns."""
    genome, k, solid = genome_set
    em = X.build(solid, k)
    repeat = np.unique(K.canonical_u64(genome[:1][0] * 0 + solid[:100] & K.kmer_mask(k - 1), k - 1))
    codes = genome[:8000].copy()
    codes[100] = dna.INVALID
    codes[101] = dna.INVALID

    host = scan.compute_planes(codes, k, solid, repeat)
    P = codes.shape[0] - k + 1

    q, _ = K.kmers_from_codes(np.where(codes == dna.INVALID, 0, codes), k - 1)
    canon_q = K.canonical_u64(q, k - 1)
    is_canon = q == canon_q
    payload = X.lookup_payload(em, canon_q)
    last_base = np.where(codes[k - 1 :] == dna.INVALID, 0, codes[k - 1 :]).astype(np.uint8)
    contains, nb_in, nb_out = X.planes_from_payload(
        payload[:P], payload[1:], is_canon[:P], is_canon[1:], last_base
    )
    nb_in = np.where(contains, nb_in, 0)
    nb_out = np.where(contains, nb_out, 0)
    np.testing.assert_array_equal(contains, host.contains)
    np.testing.assert_array_equal(nb_in, host.nb_in)
    np.testing.assert_array_equal(nb_out, host.nb_out)


def test_fused_qmap_lookup(genome_set):
    """The fused quotient map (2 gathers/lookup) must agree with the ext map
    + member table pair on payload bits and the repeat bit."""
    genome, k, solid = genome_set
    rng = np.random.default_rng(7)
    repeat = np.unique(K.canonical_u64(solid[:500] & K.kmer_mask(k - 1), k - 1))
    qm = X.build_fused(solid, k, repeat)

    em = X.build(solid, k)
    rm = X.build_member(repeat)
    q, _ = K.kmers_from_codes(genome, k - 1)
    cq = K.canonical_u64(q, k - 1)
    probes = np.concatenate([cq, rng.integers(0, 1 << (2 * (k - 1)), size=20000, dtype=np.uint64)])

    got = X.lookup_q(qm, probes)
    np.testing.assert_array_equal(got & 0xFF, X.lookup_payload(em, probes))
    np.testing.assert_array_equal((got >> 8) & 1 == 1, X.lookup_member(rm, probes))


def test_fused_qmap_numpy_vs_native(genome_set):
    """The numpy fallback build and the native one-pass build must produce
    maps with identical lookup semantics (layouts may differ)."""
    genome, k, solid = genome_set
    repeat = np.unique(K.canonical_u64(solid[:200] & K.kmer_mask(k - 1), k - 1))
    qn = X._build_fused_native(solid, k, repeat, 0.35)
    if qn is None:
        pytest.skip("native builder unavailable")
    # force the numpy path by asking for k>32 gate bypass: call internals
    ek, ep = X._ext_bits(solid, k)
    rk = np.unique(repeat)
    keys_all = np.concatenate([ek, rk])
    vals_all = np.concatenate([ep.astype(np.uint16), np.full(rk.size, 1 << 8, np.uint16)])
    order = np.argsort(keys_all, kind="stable")
    ks, vs = keys_all[order], vals_all[order]
    uniq = np.empty(ks.size, bool)
    uniq[0] = True
    uniq[1:] = ks[1:] != ks[:-1]
    group = np.cumsum(uniq) - 1
    merged = np.zeros(int(group[-1]) + 1, np.uint16)
    np.bitwise_or.at(merged, group, vs)
    em2 = X._place(ks[uniq], merged, 0.35, min_log=12)
    slots = X._quotient_encode(em2.keys, em2.payload, em2.log_size)
    sk = em2.stash_keys if em2.stash_keys.size else np.array([X.EMPTY], np.uint64)
    sv = em2.stash_payload.astype(np.uint16) if em2.stash_keys.size else np.zeros(1, np.uint16)
    qp = X.QMap(slots, em2.log_size, sk, sv)

    rng = np.random.default_rng(3)
    probes = np.concatenate([ks[uniq], rng.integers(0, 1 << (2 * (k - 1)), size=20000, dtype=np.uint64)])
    np.testing.assert_array_equal(X.lookup_q(qn, probes), X.lookup_q(qp, probes))


def test_scan_planes_device_q_matches_host(genome_set):
    """Full fused device scan vs the 11-probe host oracle, including Ns."""
    import jax.numpy as jnp

    from mindthegap_tpu.find.scan_device import scan_planes_device_q

    genome, k, solid = genome_set
    repeat = np.unique(K.canonical_u64(solid[:500] & K.kmer_mask(k - 1), k - 1))
    qm = X.build_fused(solid, k, repeat)

    codes = genome[:8000].copy()
    codes[100] = dna.INVALID
    codes[101] = dna.INVALID
    host = scan.compute_planes(codes, k, solid, repeat)
    res = scan_planes_device_q(
        jnp.asarray(codes), jnp.asarray(qm.slots), jnp.asarray(qm.stash_keys),
        jnp.asarray(qm.stash_payload), qm.log_size, k,
    )
    P = codes.shape[0] - k + 1
    m = host.valid
    for name in ("fwd", "valid", "contains", "nb_in", "nb_out", "suffix_rep", "prefix_rep"):
        dev = np.asarray(res[name])[:P]
        np.testing.assert_array_equal(dev[m], getattr(host, name)[m], err_msg=name)
