import numpy as np
import pytest

from mindthegap_tpu.ops import kmers as K
from mindthegap_tpu.utils import dna


def py_revcomp(s):
    m = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(m[c] for c in reversed(s))


@pytest.mark.parametrize("k", [5, 15, 31, 32])
def test_revcomp_roundtrip(k):
    rng = np.random.default_rng(0)
    for _ in range(20):
        s = "".join(rng.choice(list("ACGT"), size=k))
        km = K.str_to_kmer(s)
        rc = K.revcomp_u64(np.uint64(km), k)
        assert K.kmer_to_str(int(rc), k) == py_revcomp(s)
        assert int(K.revcomp_u64(rc, k)) == km


def test_encoding_matches_reference_order():
    # A=0 C=1 T=2 G=3 (reference nuc_to_char, src/FindSNP.hpp:99-117)
    assert K.str_to_kmer("A") == 0
    assert K.str_to_kmer("C") == 1
    assert K.str_to_kmer("T") == 2
    assert K.str_to_kmer("G") == 3
    # complement = code ^ 2
    assert K.str_to_kmer("T") == K.str_to_kmer("A") ^ 2
    assert K.str_to_kmer("G") == K.str_to_kmer("C") ^ 2


def test_rolling_kmers_and_validity():
    seq = "ACGTNACGTACGT"
    codes = dna.seq_to_codes(seq)
    k = 4
    fwd, valid = K.kmers_from_codes(codes, k)
    assert fwd.shape[0] == len(seq) - k + 1
    for i in range(len(seq) - k + 1):
        w = seq[i : i + k]
        if "N" in w:
            assert not valid[i]
        else:
            assert valid[i]
            assert int(fwd[i]) == K.str_to_kmer(w)


def test_mutate_kmer():
    # reference doc: mutate(AAAAAAAAAA, pos=2, C) = ACAAAAAAAA
    k = 10
    km = K.str_to_kmer("A" * k)
    got = K.mutate_kmer(km, K.str_to_kmer("C"), 2, k)
    assert K.kmer_to_str(got, k) == "ACAAAAAAAA"


def test_canonical_min():
    k = 31
    rng = np.random.default_rng(1)
    s = "".join(rng.choice(list("ACGT"), size=k))
    km = np.uint64(K.str_to_kmer(s))
    canon = K.canonical_u64(km, k)
    assert int(canon) == min(int(km), int(K.revcomp_u64(km, k)))


def test_native_extraction_parity():
    """native/kmers.cpp extract_fwd / extract_canonical vs the numpy oracle,
    including N handling and boundary positions."""
    from mindthegap_tpu.ops import kmers as K
    from mindthegap_tpu.utils import dna

    rng = np.random.default_rng(12)
    for k in (5, 21, 31, 32):
        codes = rng.integers(0, 4, size=4000, dtype=np.uint8)
        codes[50] = dna.INVALID
        codes[51] = dna.INVALID
        codes[3000:3005] = dna.INVALID

        saved = (K._KM_LIB, K._KM_FAILED)
        try:
            K._KM_LIB, K._KM_FAILED = None, True  # numpy oracle
            f0, v0 = K.kmers_from_codes(codes, k)
            c0 = K.canonical_compact(codes, k)
            K._KM_LIB, K._KM_FAILED = None, False  # native
            if K._load_native() is None:
                pytest.skip("native kmers unavailable")
            f1, v1 = K.kmers_from_codes(codes, k)
            c1 = K.canonical_compact(codes, k)
        finally:
            K._KM_LIB, K._KM_FAILED = saved
        np.testing.assert_array_equal(f0, f1, err_msg=f"fwd k={k}")
        np.testing.assert_array_equal(v0, v1, err_msg=f"valid k={k}")
        np.testing.assert_array_equal(c0, c1, err_msg=f"canon k={k}")
