"""Worker process for tests/test_distributed.py — NOT a test module.

Runs one of N ``jax.distributed`` processes on the CPU backend and exercises
the real multi-host code paths the suite otherwise only simulates
single-process: loader shard striping, global-batch assembly via
``make_array_from_process_local_data`` (dmtpu.parallel.shard_batch),
per-process RNG folding, a mesh-sharded train step whose gradient psum
crosses the process boundary, and a multi-process sharded orbax checkpoint
round-trip.  Results are written as JSON for the parent test to assert on.
(Reference equivalent: Accelerate's process semantics,
reference: scripts/train_ddpm.py:54,166,186,211.)
"""
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]
    ckpt_dir = sys.argv[5]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from dmtpu.data.loader import DataLoader
    from dmtpu.parallel import (
        TrainState,
        make_mesh,
        make_train_step,
        shard_batch,
        shard_train_state,
    )
    from dmtpu.utils import checkpoint as ckpt_lib
    from dmtpu.utils import optim as optim_lib

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()

    class IndexImages:
        """Item i is an image filled with the value i — makes shard striping
        directly observable in the collated batch."""

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return np.full((4, 4, 3), float(i), np.float32)

    loader = DataLoader(IndexImages(), batch_size=4, shuffle=False,
                        drop_last=True, num_workers=0,
                        num_shards=nproc, shard_index=pid)
    local = next(iter(loader))
    local_indices = sorted({int(v) for v in local[:, 0, 0, 0]})

    mesh = make_mesh()  # all global devices, (data, fsdp=1)
    gbatch = shard_batch(local, mesh)
    assert gbatch.shape[0] == local.shape[0] * nproc, gbatch.shape

    gmean = float(jax.jit(jnp.mean)(gbatch))  # global mean -> replicated

    root = jax.random.PRNGKey(0)
    rng_scalar = float(jax.random.normal(jax.random.fold_in(root, pid)))

    params = {"w": jnp.arange(3, dtype=jnp.float32) * 0.1 + 0.1}
    tx = optim_lib.adam(lr=1e-2)
    state = shard_train_state(TrainState.create(params, tx, ema_decay=0.99), mesh)

    def loss_fn(p, b, rng):
        return jnp.mean((b * p["w"]).sum(-1) ** 2)

    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0, mesh=mesh)
    state, metrics = step_fn(state, gbatch, root)
    loss = float(metrics["loss"])

    # multi-process sharded checkpoint round-trip (all processes participate)
    path = ckpt_lib.save_checkpoint(ckpt_dir, 1, state)
    fresh = shard_train_state(
        TrainState.create({"w": jnp.zeros((3,))}, tx, ema_decay=0.99), mesh)
    restored = ckpt_lib.load_checkpoint(path, fresh)
    ckpt_diff = float(jnp.abs(restored.params["w"] - state.params["w"]).max())

    # CROSS-PROCESS fsdp: shard params over ALL 4 global devices (2 per
    # process) — the ZeRO axis spanning the process boundary: sharded train
    # step + multi-process sharded checkpoint round-trip.
    mesh_f = make_mesh(fsdp=nproc * len(jax.local_devices()))
    params_f = {"w": jnp.arange(48, dtype=jnp.float32).reshape(16, 3) * 0.01}
    state_f = shard_train_state(TrainState.create(params_f, tx, ema_decay=None),
                                mesh_f)
    w = state_f.params["w"]
    fsdp_shard_shapes = sorted(
        str(tuple(s.data.shape)) for s in w.addressable_shards)

    def loss_fn_f(p, b, rng):
        return jnp.mean((b @ p["w"]) ** 2)

    # deterministic global batch [8, 16]: each process contributes its half
    # through the SAME shard_batch path the train scripts use
    bf_np = np.arange(8 * 16, dtype=np.float32).reshape(8, 16) * 0.01
    bf = shard_batch(bf_np[pid * 4:(pid + 1) * 4], mesh_f)
    step_f = make_train_step(loss_fn_f, tx, mesh=mesh_f)
    state_f, metrics_f = step_f(state_f, bf, root)
    fsdp_loss = float(metrics_f["loss"])
    path_f = ckpt_lib.save_checkpoint(ckpt_dir + "_fsdp", 1, state_f)
    fresh_f = shard_train_state(
        TrainState.create({"w": jnp.zeros((16, 3))}, tx, ema_decay=None), mesh_f)
    restored_f = ckpt_lib.load_checkpoint(path_f, fresh_f)
    fsdp_ckpt_diff = float(jax.jit(
        lambda a, b: jnp.abs(a - b).max())(restored_f.params["w"],
                                           state_f.params["w"]))

    with open(out_path, "w") as f:
        json.dump({
            "pid": pid,
            "n_global_devices": len(jax.devices()),
            "n_local_devices": len(jax.local_devices()),
            "local_indices": local_indices,
            "global_batch": int(gbatch.shape[0]),
            "global_mean": gmean,
            "rng_scalar": rng_scalar,
            "loss": loss,
            "step_after": int(jax.device_get(state.step)),
            "ckpt_diff": ckpt_diff,
            "fsdp_shard_shapes": fsdp_shard_shapes,
            "fsdp_loss": fsdp_loss,
            "fsdp_ckpt_diff": fsdp_ckpt_diff,
        }, f)


if __name__ == "__main__":
    main()
