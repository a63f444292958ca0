import collections

import numpy as np
import pytest

from mindthegap_tpu.io.bank import Bank
from mindthegap_tpu.ops import counting
from mindthegap_tpu.graph import dbg
from mindthegap_tpu.utils import dna


def brute_counts(seqs, k):
    comp = str.maketrans("ACGT", "TGCA")
    cnt = collections.Counter()
    order = {"A": 0, "C": 1, "T": 2, "G": 3}

    def key(s):
        return tuple(order[c] for c in s)

    for seq in seqs:
        seq = seq.upper()
        for i in range(len(seq) - k + 1):
            km = seq[i : i + k]
            if any(c not in "ACGT" for c in km):
                continue
            rc = km.translate(comp)[::-1]
            canon = km if key(km) <= key(rc) else rc
            cnt[canon] += 1
    return cnt


def test_counter_matches_bruteforce():
    rng = np.random.default_rng(42)
    seqs = ["".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=200)) for _ in range(30)]
    k = 11
    c = counting.StreamingCounter(k, batch_kmers=500)
    for s in seqs:
        c.add_codes(dna.seq_to_codes(s))
    res = c.result()
    ref = brute_counts(seqs, k)
    from mindthegap_tpu.ops import kmers as K

    got = {K.kmer_to_str(int(km), k): int(ct) for km, ct in zip(res.kmers, res.counts)}
    assert got == dict(ref)


@pytest.mark.slow
def test_full_test_reads_solidity(refdir):
    """Gold calibration: auto cutoff 7, 7419 solid kmers
    (reference test/full_test/gold_find.output)."""
    uri = f"{refdir}/data/reads_r1.fastq,{refdir}/data/reads_r2.fastq"
    g = dbg.build_graph(uri, 31, "auto")
    assert g.info["thresholds"] == 7
    assert g.info["kmers_nb_solid"] == 7419
    assert g.info["nb_branching"] == 36


@pytest.mark.slow
def test_contig_reads_solidity(refdir):
    """Gold calibration: abundance-min 3 -> 10194 solid kmers, 46 branching
    (reference test/contig_test/gold.log)."""
    g = dbg.build_graph(f"{refdir}/data/contig-reads.fasta.gz", 31, 3)
    assert g.info["kmers_nb_solid"] == 10194
    assert g.info["nb_branching"] == 46


def test_device_counter_matches_host():
    """DeviceStreamingCounter (extract+sort on device) must reproduce the
    host counter exactly — keys, counts, histogram — including mid-read
    buffer splits (tiny batch forces them)."""
    import numpy as np

    from mindthegap_tpu.io.bank import iter_codes
    from mindthegap_tpu.ops.counting import StreamingCounter
    from mindthegap_tpu.ops.counting_device import DeviceStreamingCounter

    k = 21
    host = StreamingCounter(k)
    dev = DeviceStreamingCounter(k, batch_bases=1 << 12)  # force many splits
    n = 0
    for _h, codes in iter_codes("/root/reference/data/reads_r1.fastq"):
        host.add_codes(codes)
        dev.add_codes(codes)
        n += 1
        if n >= 400:
            break
    hr = host.result()
    dr = dev.result()
    assert np.array_equal(hr.kmers, dr.kmers)
    assert np.array_equal(hr.counts, dr.counts)
    assert np.array_equal(hr.histogram, dr.histogram)


def test_device_counter_flush_no_alias_clobber():
    """Regression gate for the async flush race: _flush used to clear the
    numpy staging buffer before the device program materialized; when
    jnp.asarray zero-copy aliased it (CPU backend) the program read SEP
    fill and returned an empty run (silent empty graph). Loop many fresh
    counters with forced mid-read flushes so any alias regression trips."""
    import numpy as np

    from mindthegap_tpu.ops.counting import StreamingCounter
    from mindthegap_tpu.ops.counting_device import DeviceStreamingCounter
    from mindthegap_tpu.utils import dna

    rng = np.random.default_rng(7)
    k = 21
    seqs = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(40)]
    codes = [dna.seq_to_codes(s) for s in seqs]
    host = StreamingCounter(k)
    for c in codes:
        host.add_codes(c)
    hr = host.result()
    assert hr.kmers.size > 0
    for _ in range(20):
        dev = DeviceStreamingCounter(k, batch_bases=1 << 10)
        for c in codes:
            dev.add_codes(c)
        dr = dev.result()
        assert np.array_equal(hr.kmers, dr.kmers)
        assert np.array_equal(hr.counts, dr.counts)


def test_device_count_graph_identical():
    """E2E gate: find's graph build with -count-engine device produces a
    graph artifact identical to the host build (VERDICT r3 item 1 — a
    silently empty graph under the device engine is the worst failure
    class in the repo)."""
    import numpy as np

    uri = "/root/reference/data/contig-reads.fasta.gz"
    gh = dbg.build_graph(uri, 31, 3, count_engine="host")
    gd = dbg.build_graph(uri, 31, 3, count_engine="device")
    assert gh.info == gd.info
    assert gd.solid.keys.size > 0
    assert np.array_equal(gh.solid.keys, gd.solid.keys)
    assert np.array_equal(gh.solid.counts, gd.solid.counts)


def test_sharded_counter_matches_host():
    """ShardedStreamingCounter (mesh all_to_all key routing + psum
    histogram) must reproduce the host counter exactly — keys, counts,
    histogram — including mid-read buffer splits (tiny batch forces both
    multiple flushes and the k-1 rewind)."""
    import numpy as np

    from mindthegap_tpu.io.bank import iter_codes
    from mindthegap_tpu.ops.counting import StreamingCounter
    from mindthegap_tpu.parallel.sharded_count import ShardedStreamingCounter

    k = 21
    host = StreamingCounter(k)
    sharded = ShardedStreamingCounter(k, batch_bases=1 << 13)
    assert sharded.n_dev == 8
    n = 0
    for _h, codes in iter_codes("/root/reference/data/reads_r1.fastq"):
        host.add_codes(codes)
        sharded.add_codes(codes)
        n += 1
        if n >= 400:
            break
    hr = host.result()
    sr = sharded.result()
    assert np.array_equal(hr.kmers, sr.kmers)
    assert np.array_equal(hr.counts, sr.counts)
    assert np.array_equal(hr.histogram, sr.histogram)


def test_sharded_count_graph_identical(tmp_path):
    """build_graph(count_engine=sharded) must produce a byte-identical graph
    artifact to the host build (SURVEY.md §2.3 row 1: mesh-wired DSK)."""
    import numpy as np

    uri = "/root/reference/data/contig-reads.fasta.gz"
    gh = dbg.build_graph(uri, 31, 3, count_engine="host")
    gs = dbg.build_graph(uri, 31, 3, count_engine="sharded")
    assert gh.info == gs.info
    assert np.array_equal(gh.solid.keys, gs.solid.keys)
    assert np.array_equal(gh.solid.counts, gs.solid.counts)


def test_partitioned_counter_matches_host(tmp_path):
    """PartitionedCounter (disk-spill by key range, -max-memory contract)
    must reproduce the host counter exactly; a tiny budget forces many
    partitions."""
    import numpy as np

    from mindthegap_tpu.io.bank import iter_codes
    from mindthegap_tpu.ops.counting import PartitionedCounter, StreamingCounter

    k = 21
    host = StreamingCounter(k)
    part = PartitionedCounter(k, memory_mb=16, tmp_dir=str(tmp_path),
                              n_partitions=8, batch_kmers=1 << 12)
    for _h, codes in iter_codes("/root/reference/data/reads_r1.fastq"):
        host.add_codes(codes)
        part.add_codes(codes)
    assert part.n_partitions_used() > 1
    hr = host.result()
    pr = part.result()
    assert np.array_equal(hr.kmers, pr.kmers)
    assert np.array_equal(hr.counts, pr.counts)
    assert np.array_equal(hr.histogram, pr.histogram)


def test_partitioned_build_graph_identical(tmp_path):
    """build_graph via the partitioned engine == host engine byte-for-byte
    (auto cutoff flows through the two-pass finalize)."""
    import numpy as np

    uri = "/root/reference/data/reads_r1.fastq,/root/reference/data/reads_r2.fastq"
    gh = dbg.build_graph(uri, 31, "auto", count_engine="host")
    gp = dbg.build_graph(uri, 31, "auto", count_engine="partitioned",
                         max_memory_mb=16, tmp_prefix=str(tmp_path))
    assert gh.info == gp.info
    assert np.array_equal(gh.solid.keys, gp.solid.keys)
    assert np.array_equal(gh.solid.counts, gp.solid.counts)


def test_partitioned_resplit_oversized_partition(tmp_path):
    """A spill partition bigger than the budget is recursively re-split by
    the next key bits and still yields exact, ordered runs."""
    import numpy as np

    from mindthegap_tpu.ops.counting import PartitionedCounter

    k = 21
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=200_000, dtype=np.uint8)
    # 2 partitions so one file takes ~half the kmers; 16 MB is the floor, so
    # shrink the budget attribute directly to force the resplit path
    pc = PartitionedCounter(k, memory_mb=16, tmp_dir=str(tmp_path), n_partitions=2)
    pc.add_codes(codes)
    pc._budget = 1 << 17  # 128 KB: every partition file (~0.8 MB) re-splits
    res = pc.result()
    from mindthegap_tpu.ops import kmers as K

    want_u, want_c = np.unique(K.canonical_u64(
        K.kmers_from_codes(codes, k)[0], k), return_counts=True)
    assert np.array_equal(res.kmers, want_u)
    assert np.array_equal(res.counts, want_c)


def test_count_batch_device_matches_numpy():
    """count_batch_device (fused extract+sort+RLE, scatter-free compaction)
    must reproduce the exact distinct-key/count sets, including separator
    handling and the compacted-prefix contract."""
    import jax.numpy as jnp

    from mindthegap_tpu.ops import kmers as K
    from mindthegap_tpu.ops.counting_device import SENTINEL, count_batch_device

    rng = np.random.default_rng(5)
    k = 21
    codes = rng.integers(0, 4, size=100000, dtype=np.uint8)
    codes[5000:5003] = 255  # read separators
    keys_d, counts_d, nd_d = count_batch_device(jnp.asarray(codes), k)
    nd = int(nd_d)
    keys = np.asarray(keys_d[:nd])
    counts = np.asarray(counts_d[:nd])
    fwd, valid = K.kmers_from_codes(codes, k)
    canon = K.canonical_u64(fwd, k)[valid.astype(bool)]
    u, c = np.unique(canon, return_counts=True)
    assert keys.size == u.size
    assert (keys == u).all() and (counts == c).all()
    assert (np.asarray(keys_d[nd:]) == SENTINEL).all()


def test_device_streaming_counter_matches_host():
    """DeviceStreamingCounter (sliced distinct-prefix transfers) equals the
    host StreamingCounter across multi-flush batches."""
    from mindthegap_tpu.ops.counting import StreamingCounter
    from mindthegap_tpu.ops.counting_device import DeviceStreamingCounter

    rng = np.random.default_rng(9)
    k = 15
    host = StreamingCounter(k)
    dev = DeviceStreamingCounter(k, batch_bases=1 << 12)
    for _ in range(40):
        read = rng.integers(0, 4, size=rng.integers(40, 300), dtype=np.uint8)
        host.add_codes(read)
        dev.add_codes(read)
    hr = host.result()
    dr = dev.result()
    assert (hr.kmers == dr.kmers).all()
    assert (hr.counts == dr.counts).all()
    assert (hr.histogram == dr.histogram).all()


def test_device_streaming_counter_packed_count_exceptions(monkeypatch):
    """Counts cross the device->host boundary as clamped u8 + a compacted
    exception list (pack_counts_device). Counts over 255 must survive the
    round trip exactly — both through the exception list and through the
    full-width fallback when the list capacity is exceeded."""
    import mindthegap_tpu.ops.counting_device as CD
    from mindthegap_tpu.ops.counting import StreamingCounter

    k = 15
    rng = np.random.default_rng(13)
    hot = rng.integers(0, 4, size=60, dtype=np.uint8)  # repeated: counts ~300
    reads = [hot] * 300 + [rng.integers(0, 4, size=120, dtype=np.uint8) for _ in range(50)]

    host = StreamingCounter(k)
    for r in reads:
        host.add_codes(r)
    hr = host.result()
    assert int(hr.counts.max()) > 255, "test input must exercise the exception path"

    dev = CD.DeviceStreamingCounter(k, batch_bases=1 << 12)
    for r in reads:
        dev.add_codes(r)
    dr = dev.result()
    assert np.array_equal(hr.kmers, dr.kmers)
    assert np.array_equal(hr.counts, dr.counts)

    # force the truncation fallback: every over-255 entry no longer fits
    monkeypatch.setattr(CD, "_EXC_CAP", 1)
    dev2 = CD.DeviceStreamingCounter(k, batch_bases=1 << 12)
    for r in reads:
        dev2.add_codes(r)
    dr2 = dev2.result()
    assert np.array_equal(hr.counts, dr2.counts)


def test_device_counter_capacity_overflow_redo():
    """The device accumulator's capacity-overflow protocol: a tiny init_cap
    forces truncated merges whose scalar sync detects the overflow, grows
    the capacity, and re-runs the merge from the kept inputs — the final
    result must still equal the host counter exactly."""
    import numpy as np

    from mindthegap_tpu.ops.counting import StreamingCounter
    from mindthegap_tpu.ops.counting_device import DeviceStreamingCounter

    k = 15
    rng = np.random.default_rng(11)
    reads = [rng.integers(0, 4, size=120, dtype=np.uint8) for _ in range(200)]

    host = StreamingCounter(k)
    dev = DeviceStreamingCounter(k, batch_bases=1 << 12, init_cap=64)
    for r in reads:
        host.add_codes(r)
        dev.add_codes(r)
    hr, dr = host.result(), dev.result()
    assert dev._cap > 64, "overflow growth never triggered"
    assert np.array_equal(hr.kmers, dr.kmers)
    assert np.array_equal(hr.counts, dr.counts)
    assert np.array_equal(hr.histogram, dr.histogram)
