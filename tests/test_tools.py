"""Auxiliary tool suite: simulators (reference test/scripts/*), evaluators
(reference test/vde.py + test/eval.cpp) — exercised as a full simulate ->
find -> fill -> score pipeline."""

import random
import subprocess
import sys

REPO = "/root/repo"


def run(args, **kw):
    return subprocess.run([sys.executable] + args, check=True,
                          capture_output=True, text=True, **kw).stdout


def test_simulate_find_fill_eval_pipeline(tmp_path):
    random.seed(7)
    seq = "".join(random.choice("ACGT") for _ in range(6000))
    genome = tmp_path / "genome.fasta"
    with open(genome, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")

    run([f"{REPO}/scripts/simulators/make_deletions.py", "-g", str(genome),
         "-o", str(tmp_path / "mut"), "-n", "4", "-m", "80", "-M", "150",
         "-s", "200", "--seed", "3"])
    reads = run([f"{REPO}/scripts/simulators/generate_read.py", "-f", str(genome),
                 "-n", "3000", "-l", "100", "--seed", "5"])
    (tmp_path / "reads.fasta").write_text(reads)

    run([f"{REPO}/bin/MindTheGap", "find", "-in", str(tmp_path / "reads.fasta"),
         "-ref", str(tmp_path / "mut.fasta"), "-out", str(tmp_path / "sim"),
         "-abundance-min", "3"])
    run([f"{REPO}/bin/MindTheGap", "fill", "-graph", str(tmp_path / "sim.h5"),
         "-bkpt", str(tmp_path / "sim.breakpoints"), "-out", str(tmp_path / "simf")])

    out = run([f"{REPO}/scripts/eval_insertions.py", str(tmp_path / "mut.del.fasta"),
               str(tmp_path / "sim.breakpoints"),
               str(tmp_path / "simf.insertions.fasta")], cwd=tmp_path)
    assert "Find recall         4 / 4  : 1.000" in out
    assert "Recall (> 0.90)     4 / 4  : 1.000" in out
    assert "Fill prec           4 / 4  : 1.000" in out


def test_make_snp_deletions_and_vde(tmp_path):
    random.seed(9)
    seq = "".join(random.choice("ACGT") for _ in range(6000))
    genome = tmp_path / "genome.fasta"
    genome.write_text(">chr1\n" + seq + "\n")

    run([f"{REPO}/scripts/simulators/make_snp_deletions.py", "-g", str(genome),
         "-o", str(tmp_path / "snpdel"), "-n", "5", "-m", "60", "-M", "100",
         "--seed", "11"])
    eva = tmp_path / "snpdel.eva"
    assert sum(1 for _ in open(eva)) == 10  # 5 deletions + 5 snps

    out = run([f"{REPO}/scripts/vde.py", "-e", str(eva), "-t", str(eva), "-d", "5"])
    assert "multi_snp,5,0,1.0,1.0" in out
    assert "homo,5,0,1.0,1.0" in out


def test_pygatb_compat_shim(tmp_path):
    """The pyGATB-style Graph/Node facade (mindthegap_tpu/compat/gatb.py)
    must answer degree/membership queries like the reference's pyGATB
    (reference scripts/python3/Context_genome_WG.py:1,96-101)."""
    import numpy as np

    from mindthegap_tpu.compat.gatb import Graph
    from mindthegap_tpu.graph import dbg
    from mindthegap_tpu.ops import kmers as K
    from mindthegap_tpu.utils import dna

    rng = np.random.default_rng(4)
    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=3000))
    codes = dna.seq_to_codes(genome)
    fwd, _ = K.kmers_from_codes(codes, k)
    canon = np.unique(K.canonical_u64(fwd, k))
    solid = dbg.SolidSet(canon, k, np.ones(canon.size, np.int64))
    g = dbg.Graph(solid, {"kmers_nb_solid": canon.size, "thresholds": 1})
    g.save(str(tmp_path / "g.h5"))

    graph = Graph("-in %s" % (tmp_path / "g.h5"))
    assert graph.kmer_size == k
    kmer = genome[100 : 100 + k]
    node = graph[kmer]
    assert kmer in graph
    assert str(node) == kmer
    assert bytes(node) == kmer.encode()
    assert node.reversed == node  # canonical equality, as pyGATB
    # degrees agree with the graph's own int API
    fwd_int = int(fwd[100])
    assert node.in_degree == g.indegree_int(fwd_int)
    assert node.out_degree == g.outdegree_int(fwd_int)
    assert node.in_degree >= 1 and node.out_degree >= 1


def test_profile_flag_adds_phase_timings(tmp_path):
    """-profile adds a Per-phase timings section to the result report;
    default output stays byte-compatible (no such section)."""
    import io

    from mindthegap_tpu.find import runner

    data = "/root/reference/data"
    base = {
        "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
        "ref": f"{data}/reference.fasta",
        "scan-engine": "host",
        "verbose": 0,
    }
    out1 = io.StringIO()
    runner.run_find(dict(base, out=str(tmp_path / "p1")), out=out1)
    assert "Per-phase timings" not in out1.getvalue()

    out2 = io.StringIO()
    runner.run_find(dict(base, out=str(tmp_path / "p2"), profile=True), out=out2)
    text = out2.getvalue()
    assert "Per-phase timings" in text
    assert "graph build" in text and "scan planes" in text and "automaton replay" in text


def test_dbginfo_export_h5_roundtrip(tmp_path):
    """dbginfo -export-h5 writes a REAL HDF5 container (h5py/h5dump
    inspectable) that Graph.load accepts interchangeably with the native
    npz artifact (reference README.md:210-231 interop expectation)."""
    import subprocess
    import sys as _sys

    import h5py
    import numpy as np

    from mindthegap_tpu.graph.dbg import Graph, SolidSet
    from mindthegap_tpu.ops.span import Span

    rng = np.random.default_rng(0)

    # k <= 32 (u64 keys) and a span k (void keys via multi-word rows)
    cases = []
    keys31 = np.unique(rng.integers(0, 1 << 61, size=5000, dtype=np.uint64))
    cases.append(Graph(SolidSet(keys31, 31, np.full(keys31.size, 3, np.int64)),
                       {"thresholds": 3, "kmers_nb_solid": int(keys31.size)}))
    sp = Span(45)
    rows, valid = sp.from_codes(rng.integers(0, 4, size=4000, dtype=np.uint8))
    keys45 = np.unique(sp.keys(sp.canonical(rows[valid])))
    cases.append(Graph(SolidSet(keys45, 45, np.full(keys45.size, 2, np.int64)),
                       {"thresholds": 2}))

    for i, g in enumerate(cases):
        npz = str(tmp_path / f"g{i}.h5")
        g.save(npz)
        out = str(tmp_path / f"export{i}.h5")
        r = subprocess.run(
            [_sys.executable, "bin/dbginfo", "-in", npz, "-export-h5", out],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert h5py.is_hdf5(out) and not h5py.is_hdf5(npz)
        with h5py.File(out) as f:
            assert f.attrs["format"] == "mindthegap_tpu-dbg"
            assert int(f.attrs["kmer_size"]) == g.k
        g2 = Graph.load(out)
        assert g2.k == g.k and g2.info == g.info
        assert np.array_equal(g2.solid.keys, g.solid.keys)
        assert np.array_equal(g2.solid.counts, g.solid.counts)
