"""True multi-process distributed test: two OS processes, each 4 virtual
CPU devices, joined via jax.distributed (gloo) into one 8-device mesh, run
the multihost SPMD driver end-to-end and must reproduce the single-host
streaming pipeline byte-for-byte at identity sampling (SURVEY.md §4.4 --
this exercises the real jax.distributed + make_array_from_process_local_data
+ psum-across-processes path that the in-process mesh tests cannot).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)
sys.path.insert(0, sys.argv[4])
from approx_counter_tpu.params import Params
from approx_counter_tpu.dist.multihost import run_pipeline_multihost
prm = Params(
    input_file=sys.argv[5],      # comma-separated per-host shard files
    output=sys.argv[6],
    exact_out=sys.argv[7],
    k=6, sl=12, sn=int(sys.argv[8]), limit=10, v=int(sys.argv[9]),
    seed=1, multihost=True,
)
sys.exit(run_pipeline_multihost(prm))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_matches_single_host(tmp_path, rng):
    # hang protection comes from the workers' communicate(timeout=540)
    from approx_counter_tpu.core.codec import codes_to_seq
    from approx_counter_tpu.params import Params
    from approx_counter_tpu.pipeline import run_pipeline

    sl, k = 12, 6
    seqs = [codes_to_seq(rng.integers(0, 4, 40)) for _ in range(20)]
    fa_all = tmp_path / "all.fasta"
    fa0 = tmp_path / "shard0.fasta"
    fa1 = tmp_path / "shard1.fasta"
    with open(fa_all, "w") as fall, open(fa0, "w") as f0, open(fa1, "w") as f1:
        for i, s in enumerate(seqs):
            rec = f">r{i}\n{s}\n"
            fall.write(rec)
            (f0 if i % 2 == 0 else f1).write(rec)

    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out_mh = str(tmp_path / "mh.txt")
    ex_mh = str(tmp_path / "mhe.txt")
    env = {
        k_: v_ for k_, v_ in os.environ.items()
        if k_ not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    args = [sys.executable, str(worker)]
    tail = [str(port), REPO, f"{fa0},{fa1}", out_mh, ex_mh, "100", "0"]
    procs = [
        subprocess.Popen(args + [str(pid), "2"] + tail, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]

    prm_s = Params(input_file=str(fa_all), output=str(tmp_path / "s.txt"),
                   exact_out=str(tmp_path / "se.txt"),
                   k=k, sl=sl, sn=100, limit=10, v=0, seed=1, stream=True)
    assert run_pipeline(prm_s) == 0
    for end in ("start", "end"):
        assert (tmp_path / f"mh.txt_0.{end}").read_bytes() == (
            tmp_path / f"s.txt_0.{end}"
        ).read_bytes(), end
        assert (tmp_path / f"mhe.txt_0.{end}").read_bytes() == (
            tmp_path / f"se.txt_0.{end}"
        ).read_bytes(), end


def test_two_process_unbalanced_shards_full_budget(tmp_path, rng):
    """The round-4 uniformity fix: shards of 3 and 17 eligible reads with
    sn=10 must yield a GLOBAL sample of exactly 10 (the old fixed per-host
    quotas gave min(5,3) + 5 = 8, silently undersampling).  Host 0's log
    must say 'Sampled 10 sequences'."""
    from approx_counter_tpu.core.codec import codes_to_seq

    seqs = [codes_to_seq(rng.integers(0, 4, 40)) for _ in range(20)]
    fa0 = tmp_path / "shard0.fasta"
    fa1 = tmp_path / "shard1.fasta"
    with open(fa0, "w") as f0, open(fa1, "w") as f1:
        for i, s in enumerate(seqs):
            (f0 if i < 3 else f1).write(f">r{i}\n{s}\n")

    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = {
        k_: v_ for k_, v_ in os.environ.items()
        if k_ not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    args = [sys.executable, str(worker)]
    tail = [str(port), REPO, f"{fa0},{fa1}", str(tmp_path / "mh.txt"),
            str(tmp_path / "mhe.txt"), "10", "1"]
    procs = [
        subprocess.Popen(args + [str(pid), "2"] + tail, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
        assert p.returncode == 0, err.decode()[-2000:]
    assert "Sampled 10 sequences" in outs[0], outs[0][-2000:]
    # non-host0 processes emit no framework output (gloo chatter aside)
    assert "Sampled" not in outs[1] and "Kmer size" not in outs[1]
    # exports exist and the exact counts sum is consistent with 10 windows
    exact = (tmp_path / "mhe.txt_0.start").read_text().splitlines()
    total = sum(int(line.split("\t")[1]) for line in exact)
    # 10 start windows of 12 bases, k=6 -> 10*(12-6+1)=70 positions max
    assert 0 < total <= 70, total


WORKER4 = WORKER.replace("device_count=4", "device_count=2")


def test_four_process_unbalanced_shards(tmp_path, rng):
    """4 gloo processes x 2 virtual devices, shards of 1/2/3/14 eligible
    reads, sn=12: the global bottom-k sample must still fill the budget
    exactly (1+2+3 = 6 < three hosts' naive quota of 9)."""
    from approx_counter_tpu.core.codec import codes_to_seq

    seqs = [codes_to_seq(rng.integers(0, 4, 40)) for _ in range(20)]
    shards = [tmp_path / f"shard{i}.fasta" for i in range(4)]
    sizes = [1, 2, 3, 14]
    idx = 0
    for path, n in zip(shards, sizes):
        with open(path, "w") as f:
            for _ in range(n):
                f.write(f">r{idx}\n{seqs[idx]}\n")
                idx += 1

    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER4)
    env = {
        k_: v_ for k_, v_ in os.environ.items()
        if k_ not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    args = [sys.executable, str(worker)]
    tail = [str(port), REPO, ",".join(str(s) for s in shards),
            str(tmp_path / "mh.txt"), str(tmp_path / "mhe.txt"),
            "12", "1"]
    procs = [
        subprocess.Popen(args + [str(pid), "4"] + tail, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
        assert p.returncode == 0, err.decode()[-2000:]
    assert "Sampled 12 sequences" in outs[0], outs[0][-2000:]
    assert "Number of sequences found: 20." in outs[0]
