"""Two-process multi-host parity (SURVEY.md §4): the same find run executed
by two jax.distributed processes sharing one global mesh must produce
artifacts byte-identical to the single-process run."""

import io
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_find_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_find_parity(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    outdir = str(tmp_path)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # worker pins its own device count (4/process)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out
        assert f"COUNT_OK {pid}" in out

    # exactly one writer host, and it is process 0
    assert open(os.path.join(outdir, "writer0")).read() == "1"
    assert open(os.path.join(outdir, "writer1")).read() == "0"

    # single-process oracle
    from mindthegap_tpu.find import runner

    data = "/root/reference/data"
    solo = os.path.join(outdir, "solo")
    runner.run_find(
        {
            "in": f"{data}/reads_r1.fastq,{data}/reads_r2.fastq",
            "ref": f"{data}/reference.fasta",
            "out": solo,
            "scan-engine": "host",
            "automaton": "host",
            "verbose": 0,
        },
        out=io.StringIO(),
    )

    def strip_vcf(path):
        return [l for l in open(path) if not l.startswith("##")]

    for pid in range(2):
        prefix = os.path.join(outdir, f"proc{pid}")
        assert open(prefix + ".breakpoints").read() == open(solo + ".breakpoints").read()
        assert strip_vcf(prefix + ".othervariants.vcf") == strip_vcf(solo + ".othervariants.vcf")
