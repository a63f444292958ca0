"""Device-pass parity (jnp vs numpy oracle) and multi-chip sharding tests.

Runs on the CPU backend with 8 virtual devices (conftest)."""

import numpy as np
import pytest

from mindthegap_tpu.graph import dbg
from mindthegap_tpu.ops import kmers as K
from mindthegap_tpu.utils import dna
from mindthegap_tpu.find import scan
from mindthegap_tpu.find.scan_device import compute_planes_device
from mindthegap_tpu.parallel import mesh as M


@pytest.fixture(scope="module")
def tiny_graph():
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=5000))
    k = 21
    reads = []
    for _ in range(900):
        i = rng.integers(0, 5000 - 100)
        r = genome[i : i + 100]
        reads.append(r)
    counter_codes = [dna.seq_to_codes(r) for r in reads]
    from mindthegap_tpu.ops import counting

    c = counting.StreamingCounter(k)
    for cc in counter_codes:
        c.add_codes(cc)
    res = c.result()
    keep = res.counts >= 3
    solid = dbg.SolidSet(res.kmers[keep], k, res.counts[keep])
    rep = dbg.SolidSet(np.sort(res.kmers[keep][: 50]), k - 1)  # arbitrary repeat set
    return genome, k, solid, rep


def test_device_planes_match_host(tiny_graph):
    genome, k, solid, rep = tiny_graph
    # inject Ns to exercise validity
    g = genome[:1500] + "N" + genome[1501:3000]
    codes = dna.seq_to_codes(g)
    host = scan.compute_planes(codes, k, solid.kmers, rep.kmers)
    dev = compute_planes_device(codes, k, solid.kmers, rep.kmers, window=512)
    for field in ("valid", "fwd", "contains", "nb_in", "nb_out", "suffix_rep", "prefix_rep"):
        np.testing.assert_array_equal(getattr(host, field), getattr(dev, field), err_msg=field)


def test_sharded_scan_matches_host(tiny_graph):
    genome, k, solid, rep = tiny_graph
    m = M.make_mesh(8)
    W = 256
    codes = dna.seq_to_codes(genome)
    halo = k - 1
    step = W - halo
    wins = []
    for s in range(0, 8 * step, step):
        chunk = np.full(W, 255, np.uint8)
        part = codes[s : s + W]
        chunk[: part.shape[0]] = part
        wins.append(chunk)
    wins = np.stack(wins)
    planes = M.sharded_scan(m, wins, solid.kmers, rep.kmers, k)
    # compare against host scan on the same windows
    for i in range(wins.shape[0]):
        host = scan.compute_planes(wins[i], k, solid.kmers, rep.kmers)
        np.testing.assert_array_equal(host.contains, planes["contains"][i])
        np.testing.assert_array_equal(host.nb_in, planes["nb_in"][i])


def test_distributed_count_histogram(tiny_graph):
    genome, k, solid, rep = tiny_graph
    m = M.make_mesh(8)
    rng = np.random.default_rng(0)
    reads = np.stack(
        [dna.seq_to_codes(genome[i : i + 64]) for i in rng.integers(0, 4000, size=64)]
    )
    runs, ghist = M.distributed_count_step(m, reads, k, histo_max=100)
    # oracle histogram
    from collections import Counter

    cnt = Counter()
    for row in reads:
        fwd, valid = K.kmers_from_codes(row, k)
        for km in K.canonical_u64(fwd[valid], k):
            cnt[int(km)] += 1
    want = np.zeros(101, np.int64)
    for v in cnt.values():
        want[min(v, 100)] += 1
    np.testing.assert_array_equal(ghist, want)


def test_sharded_find_end_to_end_identical(tmp_path):
    """The multi-device window-sharded find must produce byte-identical
    artifacts to the single-host run (the reference CI pins -nb-cores 1 for
    determinism; our sharded merge is deterministic by construction —
    SURVEY.md §4 'multi-host tests ... asserting identical merged
    artifacts')."""
    from mindthegap_tpu.find import runner

    data = "/root/reference/data"
    outs = {}
    for eng in ("host", "sharded"):
        prefix = str(tmp_path / f"e2e_{eng}")
        opts = {
            "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
            "ref": f"{data}/reference.fasta",
            "out": prefix,
            "scan-engine": eng,
            "automaton": "host",
            "verbose": 0,
        }
        import io

        runner.run_find(opts, out=io.StringIO())
        outs[eng] = (
            open(prefix + ".breakpoints").read(),
            [l for l in open(prefix + ".othervariants.vcf") if not l.startswith("##")],
        )
    assert outs["host"][0] == outs["sharded"][0], "breakpoints differ across engines"
    assert outs["host"][1] == outs["sharded"][1], "VCF records differ across engines"


def test_sharded_mem_find_end_to_end_identical(tmp_path):
    """Over-HBM membership routing (scan-engine sharded-mem / auto with a
    tiny -scan-memory budget): the Bloom-prefiltered all_to_all sharded
    solid set must yield byte-identical find artifacts on the 8-device CPU
    mesh (VERDICT r3 item 4 — the SURVEY §2.3 'sharded Bloom' row as a real
    engine)."""
    import io

    from mindthegap_tpu.find import runner
    from mindthegap_tpu.parallel.sharded_membership import ShardedMembership

    # spy: the routed path must actually run (a silent fallback to the host
    # scan would make this test vacuous)
    routed = []
    orig = ShardedMembership.contains

    def spy(self, keys):
        routed.append(len(keys))
        return orig(self, keys)

    ShardedMembership.contains = spy

    data = "/root/reference/data"
    outs = {}
    for eng, extra in (
        ("host", {}),
        ("sharded-mem", {}),
        # auto must route to sharded-mem when the projected replicated map
        # exceeds the budget (1 MB here; the solid set maps to ~4 MB)
        ("auto", {"scan-memory": "1"}),
    ):
        prefix = str(tmp_path / f"e2e_{eng}")
        opts = {
            "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
            "ref": f"{data}/reference.fasta",
            "out": prefix,
            "scan-engine": eng,
            "automaton": "host",
            "verbose": 0,
            **extra,
        }
        runner.run_find(opts, out=io.StringIO())
        outs[eng] = (
            open(prefix + ".breakpoints").read(),
            [l for l in open(prefix + ".othervariants.vcf") if not l.startswith("##")],
        )
    ShardedMembership.contains = orig
    assert len(routed) > 0 and sum(routed) > 0, "sharded-mem engine never routed a query"
    for eng in ("sharded-mem", "auto"):
        assert outs["host"][0] == outs[eng][0], f"breakpoints differ: host vs {eng}"
        assert outs["host"][1] == outs[eng][1], f"VCF records differ: host vs {eng}"


def test_shard_bounds_partition():
    from mindthegap_tpu.parallel.distributed import shard_bounds

    for n, s in [(0, 4), (7, 3), (8, 8), (100, 7), (3, 5)]:
        spans = [shard_bounds(n, s, i) for i in range(s)]
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c and b - a >= 0
        sizes = [b - a for a, b in spans]
        assert max(sizes) - min(sizes) <= 1


def test_dryrun_multichip():
    """Gate for the driver's multichip dry run: the FULL pipeline step
    (distributed count + sharded scan + job-sharded fill walk) must compile
    and execute on the 8-virtual-device CPU mesh. Regression guard for the
    round-2 shard_map/lax.scan carry-vma failure (fill/walk_device.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_device_qb_scan_end_to_end_identical(tmp_path):
    """The single-probe bucket-map scan engine (-scan-engine device-qb) must
    produce byte-identical artifacts to the host engine."""
    from mindthegap_tpu.find import runner

    data = "/root/reference/data"
    outs = {}
    for eng in ("host", "device-qb"):
        prefix = str(tmp_path / f"qb_{eng}")
        opts = {
            "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
            "ref": f"{data}/reference.fasta",
            "out": prefix,
            "scan-engine": eng,
            "automaton": "host",
            "verbose": 0,
        }
        import io

        runner.run_find(opts, out=io.StringIO())
        outs[eng] = (
            open(prefix + ".breakpoints").read(),
            [l for l in open(prefix + ".othervariants.vcf") if not l.startswith("##")],
        )
    assert outs["host"][0] == outs["device-qb"][0]
    assert outs["host"][1] == outs["device-qb"][1]


def test_sharded_membership_exact():
    """Bloom-prefiltered all_to_all-routed membership over a range-sharded
    key plane must equal host binary search exactly (present and absent,
    including Bloom false positives killed by the owner's exact search)."""
    import numpy as np

    from mindthegap_tpu.parallel.sharded_membership import ShardedMembership

    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 61, size=1 << 14, dtype=np.uint64))
    sm = ShardedMembership(M.make_mesh(8), keys)
    q = np.concatenate([
        rng.choice(keys, size=4000),
        rng.integers(0, 1 << 61, size=4000, dtype=np.uint64),
    ])
    rng.shuffle(q)
    got = sm.contains(q)
    idx = np.minimum(np.searchsorted(keys, q), keys.size - 1)
    assert np.array_equal(got, keys[idx] == q)

    empty = ShardedMembership(M.make_mesh(8), np.zeros(0, np.uint64))
    assert not empty.contains(q[:128]).any()


def test_device_qp_scan_end_to_end_identical(tmp_path):
    """The pair-coalesced scan engine (-scan-engine device-qp, one [1,2]-row
    lookup per two positions) must produce byte-identical artifacts to the
    host engine."""
    from mindthegap_tpu.find import runner

    data = "/root/reference/data"
    outs = {}
    for eng in ("host", "device-qp"):
        prefix = str(tmp_path / f"qp_{eng}")
        opts = {
            "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
            "ref": f"{data}/reference.fasta",
            "out": prefix,
            "scan-engine": eng,
            "automaton": "host",
            "verbose": 0,
        }
        import io

        runner.run_find(opts, out=io.StringIO())
        outs[eng] = (
            open(prefix + ".breakpoints").read(),
            [l for l in open(prefix + ".othervariants.vcf") if not l.startswith("##")],
        )
    assert outs["host"][0] == outs["device-qp"][0]
    assert outs["host"][1] == outs["device-qp"][1]


def test_pair_payload_stream_matches_q():
    """QMapP numpy reference: the pair payload stream equals the oriented
    q-engine payload stream position by position (incl. an N in the window)."""
    from mindthegap_tpu.ops import extmap as X
    from mindthegap_tpu.ops import kmers as K

    rng = np.random.default_rng(11)
    k = 21
    genome = rng.integers(0, 4, size=60000, dtype=np.uint8)
    fwd, _ = K.kmers_from_codes(genome, k)
    solid = np.unique(K.canonical_u64(fwd, k))[:40000]
    repeat = np.unique(K.canonical_u64(fwd[:2000] & K.kmer_mask(k - 1), k - 1))
    qm = X.build_fused(solid, k, repeat)
    qp = X.build_fused_pair(solid, k, repeat)

    codes = genome[:20000].copy()
    codes[777] = 255
    p = codes.shape[0] - k + 1
    n_pay = p + 1
    q, _v = K.kmers_from_codes(np.where(codes == 255, 0, codes).astype(np.uint8), k - 1)
    q = q[:n_pay]
    canon_q = K.canonical_u64(q, k - 1)
    strand = q == canon_q
    pay16 = X.lookup_q(qm, canon_q, xp=np)
    ext, pre = X._oriented((pay16 & 0xFF).astype(np.uint8), strand, np)
    rep = (pay16 >> 8) & 1
    oracle = (
        ext.astype(np.uint16) | (pre.astype(np.uint16) << 4) | (rep.astype(np.uint16) << 8)
    )
    pair = X.pair_payload_stream(qp, codes, n_pay)
    assert (pair == oracle).all()


def test_packed_pay_matches_full_planes():
    """scan_pay_device_qp + planes_from_pay must equal scan_planes_device_qp
    plane-for-plane (the packed path is what the CLI ships over the
    device->host boundary)."""
    import jax.numpy as jnp

    from mindthegap_tpu.find.scan_device import (
        planes_from_pay, scan_pay_device_qp, scan_planes_device_qp,
    )
    from mindthegap_tpu.ops import extmap as X
    from mindthegap_tpu.ops import kmers as K

    rng = np.random.default_rng(12)
    k = 21
    codes = rng.integers(0, 5, size=5000).astype(np.uint8)
    codes[codes == 4] = 255  # sprinkle invalid bases
    fwd, valid = K.kmers_from_codes(np.where(codes == 255, 0, codes), k)
    solid = np.unique(K.canonical_u64(fwd[valid[: fwd.size]] if valid.size else fwd, k))
    repeat = np.unique(K.canonical_u64(fwd[:200] & K.kmer_mask(k - 1), k - 1))
    qp = X.build_fused_pair(solid, k, repeat)
    targs = (jnp.asarray(qp.slots), jnp.asarray(qp.stash_keys),
             jnp.asarray(qp.stash_l), jnp.asarray(qp.stash_r), qp.log_size, k)
    g = jnp.asarray(codes)
    full = scan_planes_device_qp(g, *targs)
    res = scan_pay_device_qp(g, *targs)
    pw = planes_from_pay(np.asarray(res["pay8"]), np.asarray(res["rep8"]), codes, k)
    for key in ("valid", "contains", "nb_in", "nb_out", "suffix_rep", "prefix_rep", "fwd"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pw, key)), np.asarray(full[key]), err_msg=key
        )


def test_packed_span_find_end_to_end_identical(tmp_path):
    """k=45 find through the packed span device engine must be byte-identical
    to the host engine (scan_pay_device_q_span + planes_from_pay_span)."""
    import io

    from mindthegap_tpu.find import runner

    data = "/root/reference/data"
    outs = {}
    for eng in ("host", "device"):
        prefix = str(tmp_path / f"k45_{eng}")
        opts = {
            "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
            "ref": f"{data}/reference.fasta",
            "out": prefix,
            "kmer-size": 45,
            "abundance-min": 3,
            "scan-engine": eng,
            "automaton": "host",
            "verbose": 0,
        }
        runner.run_find(opts, out=io.StringIO())
        outs[eng] = (
            open(prefix + ".breakpoints").read(),
            [l for l in open(prefix + ".othervariants.vcf") if not l.startswith("##")],
        )
    assert outs["host"] == outs["device"]


def test_sharded_span_find_end_to_end_identical(tmp_path):
    """k=45 find with -scan-engine sharded (multi-word span map over the
    mesh, packed transfer) must be byte-identical to the host engine —
    the sharded scan previously silently fell back to host for k > 32."""
    import io

    from mindthegap_tpu.find import runner

    data = "/root/reference/data"
    outs = {}
    for eng in ("host", "sharded"):
        prefix = str(tmp_path / f"sh45_{eng}")
        opts = {
            "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
            "ref": f"{data}/reference.fasta",
            "out": prefix,
            "kmer-size": 45,
            "abundance-min": 3,
            "scan-engine": eng,
            "automaton": "host",
            "verbose": 0,
        }
        runner.run_find(opts, out=io.StringIO())
        outs[eng] = (
            open(prefix + ".breakpoints").read(),
            [l for l in open(prefix + ".othervariants.vcf") if not l.startswith("##")],
        )
    assert outs["host"] == outs["sharded"]
