"""Multi-word k-mer span tests (k > 32) + an end-to-end run at k = 45."""

import subprocess

import numpy as np
import pytest

from mindthegap_tpu.ops.span import Span, canonical_int, revcomp_int
from mindthegap_tpu.ops import counting
from mindthegap_tpu.utils import dna

COMP = str.maketrans("ACGT", "TGCA")


def brute_rc(s):
    return s.translate(COMP)[::-1]


def str2int(s):
    order = {"A": 0, "C": 1, "T": 2, "G": 3}
    v = 0
    for c in s:
        v = (v << 2) | order[c]
    return v


@pytest.mark.parametrize("k", [33, 45, 64, 65, 96, 128])
def test_span_roundtrip(k):
    rng = np.random.default_rng(k)
    seq = "".join(rng.choice(list("ACGT"), size=k + 50))
    sp = Span(k)
    arr, valid = sp.from_codes(dna.seq_to_codes(seq))
    assert valid.all()
    ints = sp.to_ints(arr)
    for i in range(len(seq) - k + 1):
        w = seq[i : i + k]
        assert int(ints[i]) == str2int(w), f"pos {i}"
        # revcomp
        rc_row = sp.revcomp(arr[i : i + 1])
        assert int(sp.to_ints(rc_row)[0]) == str2int(brute_rc(w))
        assert revcomp_int(str2int(w), k) == str2int(brute_rc(w))
        # canonical
        canon = sp.canonical(arr[i : i + 1])
        assert int(sp.to_ints(canon)[0]) == min(str2int(w), str2int(brute_rc(w)))
        assert canonical_int(str2int(w), k) == min(str2int(w), str2int(brute_rc(w)))


def test_span_shifts_and_lowbits():
    k = 45
    sp = Span(k)
    rng = np.random.default_rng(1)
    seq = "".join(rng.choice(list("ACGT"), size=k))
    arr, _ = sp.from_codes(dna.seq_to_codes(seq))
    v = str2int(seq)
    mask = (1 << (2 * k)) - 1
    for x in range(4):
        out = sp.shift_left_insert(arr, x)
        assert int(sp.to_ints(out)[0]) == ((v << 2) | x) & mask
        out = sp.shift_right_insert(arr, x)
        assert int(sp.to_ints(out)[0]) == (v >> 2) | (x << (2 * (k - 1)))
    low = sp.low_bits(arr, k - 1)
    assert int(Span(k - 1).to_ints(low)[0]) == v & ((1 << (2 * (k - 1))) - 1)
    sh = sp.shifted_right2(arr)
    assert int(sp.to_ints(sh)[0]) == v >> 2


def test_counting_span_matches_bruteforce():
    import collections

    rng = np.random.default_rng(9)
    k = 41
    seqs = ["".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=120)) for _ in range(20)]
    c = counting.StreamingCounter(k, batch_kmers=300)
    for s in seqs:
        c.add_codes(dna.seq_to_codes(s))
    res = c.result()
    cnt = collections.Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k]
            if "N" in w:
                continue
            cnt[min(str2int(w), str2int(brute_rc(w)))] += 1
    sp = Span(k)
    got = {int(x): int(ct) for x, ct in zip(sp.to_ints(sp.from_keys(res.kmers)), res.counts)}
    assert got == dict(cnt)


@pytest.mark.slow
def test_e2e_find_fill_k45(tmp_path):
    """Homozygous insertion detected and assembled at k=45 (multi-word span)."""
    rng = np.random.default_rng(123)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    insertion = "".join(rng.choice(list("ACGT"), size=120))
    donor = genome[:1000] + insertion + genome[1000:]
    reads = []
    for _ in range(800):
        i = int(rng.integers(0, len(donor) - 100))
        reads.append(donor[i : i + 100])
    (tmp_path / "reads.fasta").write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    (tmp_path / "ref.fasta").write_text(f">chr1\n{genome}\n")

    cli = ["python3", "bin/MindTheGap"]
    r = subprocess.run(
        cli + ["find", "-in", str(tmp_path / "reads.fasta"), "-ref", str(tmp_path / "ref.fasta"),
               "-kmer-size", "45", "-abundance-min", "3", "-out", str(tmp_path / "t45")],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    bkpts = (tmp_path / "t45.breakpoints").read_text()
    assert "HOM" in bkpts and "pos_1000" in bkpts

    r = subprocess.run(
        cli + ["fill", "-graph", str(tmp_path / "t45.h5"), "-bkpt", str(tmp_path / "t45.breakpoints"),
               "-out", str(tmp_path / "t45")],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    fasta = (tmp_path / "t45.insertions.fasta").read_text().splitlines()
    seqs = [l for l in fasta if not l.startswith(">")]
    assert insertion in seqs, "inserted sequence not assembled at k=45"


def test_mutate_kmer_span():
    """mutate_kmer must work for k > 32 (regression: OverflowError crashed
    the SNP observers at k = 45; reference src/FindSNP.hpp:87-96)."""
    from mindthegap_tpu.ops import kmers as K

    k = 45
    kmer = int("12" * 45, 4)  # alternating C,T pattern, 45 bases
    out = K.mutate_kmer(kmer, 3, 1, k)  # set first base to G
    assert (out >> (2 * (k - 1))) & 3 == 3
    assert out & ((1 << (2 * (k - 1))) - 1) == kmer & ((1 << (2 * (k - 1))) - 1)
    out = K.mutate_kmer(kmer, 0, k, k)  # set last base to A
    assert out & 3 == 0


@pytest.mark.parametrize("k", [33, 45, 64, 96])
def test_span_device_scan_parity(k):
    """scan_planes_device_q_span vs the host multi-word oracle, incl. Ns and
    the k=33 edge where the (k-1)-mer repeat set is a plain u64 set."""
    import jax.numpy as jnp

    from mindthegap_tpu.find import scan
    from mindthegap_tpu.find.scan_device import scan_planes_device_q_span
    from mindthegap_tpu.ops import extmap as X
    from mindthegap_tpu.ops import kmers as K
    from mindthegap_tpu.ops.span import Span
    from mindthegap_tpu.utils import dna

    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, size=12000, dtype=np.uint8)
    sp, spm1 = Span(k), Span(k - 1)
    arr, _ = sp.from_codes(codes)
    solid_keys = np.sort(np.unique(sp.keys(sp.canonical(arr))))
    solid_rows = sp.from_keys(solid_keys)
    sub = codes[:2000]
    if k - 1 <= 32:
        f, _ = K.kmers_from_codes(sub, k - 1)
        rep_u64 = np.unique(K.canonical_u64(f, k - 1))
        rep_keys_host = np.sort(rep_u64)
        rep_rows = rep_u64.reshape(-1, 1)
    else:
        a2, _ = spm1.from_codes(sub)
        rep_keys_host = np.sort(np.unique(spm1.keys(spm1.canonical(a2))))
        rep_rows = spm1.from_keys(rep_keys_host)

    test = codes[:5000].copy()
    test[150] = dna.INVALID
    host = scan.compute_planes_span(test, k, solid_keys, rep_keys_host)

    qms = X.build_fused_span(solid_rows, k, rep_rows)
    res = scan_planes_device_q_span(
        jnp.asarray(test), jnp.asarray(qms.slots), jnp.asarray(qms.sat),
        jnp.asarray(qms.stash_key64), jnp.asarray(qms.stash_sat),
        jnp.asarray(qms.stash_payload), qms.salt, qms.log_size, k,
    )
    P = test.shape[0] - k + 1
    m = host.valid
    for name in ("valid", "contains", "nb_in", "nb_out", "suffix_rep", "prefix_rep"):
        dev = np.asarray(res[name])[:P]
        np.testing.assert_array_equal(dev[m], getattr(host, name)[m], err_msg=f"k={k} {name}")
    ints = sp.to_ints(np.asarray(res["fwd_words"])[:, :P].T)
    assert (ints[m] == host.fwd[m]).all()
