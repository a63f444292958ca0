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
