"""True 2-process ``jax.distributed`` validation (CPU backend).

Everything multi-host in this repo is otherwise tested single-process on the
8-device CPU client; this spawns TWO actual processes (2 CPU devices each)
through ``jax.distributed.initialize`` and checks the process-boundary
semantics end-to-end: loader striping, global-batch assembly, per-process
RNG folding, the psum-ing train step, and a multi-process orbax checkpoint
round-trip.  See tests/_distributed_worker.py for the worker body.
"""
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")
NPROC = 2


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORM_NAME", None)
    # the axon sitecustomize registers its TPU PJRT plugin at interpreter
    # startup whenever this is set, which both grabs the (single-user) TPU
    # tunnel and overrides the cpu platform selection — blank it so the
    # workers are pure-CPU processes
    env["PALLAS_AXON_POOL_IPS"] = ""

    procs, outs = [], []
    for pid in range(NPROC):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(NPROC), str(port),
             str(out), str(tmp_path / "ckpt")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            logs.append(stdout.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    r = [json.loads(out.read_text()) for out in outs]
    assert [x["pid"] for x in r] == [0, 1]
    for x in r:
        assert x["n_global_devices"] == 4
        assert x["n_local_devices"] == 2
        assert x["global_batch"] == 8
        assert x["step_after"] == 1
        assert x["ckpt_diff"] == 0.0

    # loader stripes the dataset disjointly with DistributedSampler semantics
    assert r[0]["local_indices"] == [0, 2, 4, 6]
    assert r[1]["local_indices"] == [1, 3, 5, 7]
    # the assembled global batch spans BOTH processes' shards: mean of 0..7
    assert abs(r[0]["global_mean"] - 3.5) < 1e-6
    assert r[0]["global_mean"] == r[1]["global_mean"]
    # per-process RNG folding gives different streams
    assert r[0]["rng_scalar"] != r[1]["rng_scalar"]
    # the psum'd loss is identical on every process
    assert r[0]["loss"] == r[1]["loss"]

    # cross-process fsdp: each process holds 2 of the 4 row-shards of the
    # (16, 3) weight (the ZeRO axis spans the process boundary), the
    # sharded step agrees on the loss, and the multi-process sharded
    # checkpoint restores exactly
    for x in r:
        assert x["fsdp_shard_shapes"] == ["(4, 3)", "(4, 3)"]
        assert x["fsdp_ckpt_diff"] == 0.0
    assert r[0]["fsdp_loss"] == r[1]["fsdp_loss"]
