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
