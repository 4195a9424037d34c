"""Worker for tests/test_distributed.py::test_two_process_sampling_cli.

Runs scripts/sample_uncond.py's main() as one of N ``jax.distributed``
processes (CPU backend): each fold's batch is sharded over the GLOBAL device
set, the per-process slices are computed locally, gather() reassembles the
fold on every host, and only process 0 writes images
(reference: scripts/sample_uncond.py:183-190 gather-then-main-save
semantics across process boundaries).
"""
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ckpt = sys.argv[4]
    save_dir = sys.argv[5]
    out_path = sys.argv[6]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "scripts"))
    # sample_uncond's setup_jax(distributed=True) initializes from env
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import sample_uncond

    import jax

    assert jax.process_count() == nproc, jax.process_count()
    n_samples, batch_size = 6, 4  # 2 folds: one full, one padded (4+2)
    sys.argv = ["sample_uncond.py",
                "-c", os.path.join(repo, "configs", "ddpm_synthetic.yaml"),
                "--weights", ckpt, "--save_dir", save_dir,
                "--n_samples", str(n_samples), "--batch_size", str(batch_size),
                "--sampler", "ddim", "--respace_steps", "5", "--seed", "7"]
    sample_uncond.main()

    # every process reports its view; the parent asserts the union
    import numpy as np

    from _common import dp_sharding

    mesh, shard, _ = dp_sharding()
    probe = shard(np.arange(mesh.devices.size, dtype=np.float32))
    local_rows = sorted(
        int(s.data[0]) for s in probe.addressable_shards)
    with open(out_path, "w") as f:
        json.dump({
            "pid": pid,
            "n_global_devices": jax.device_count(),
            "n_local_devices": jax.local_device_count(),
            "mesh_devices": int(mesh.devices.size),
            "local_rows": local_rows,
            "saved_files": sorted(os.listdir(save_dir)),
        }, f)


if __name__ == "__main__":
    main()
