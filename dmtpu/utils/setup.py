"""Process-level JAX setup shared by all CLIs and bench."""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None, distributed: bool = False) -> None:
    """Enable the persistent compilation cache and (optionally) multi-host init.

    Remote/tunneled compiles are slow; the on-disk cache cuts re-runs from
    minutes to seconds.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "DMTPU_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if distributed and os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # jax auto-detects process count/id only on managed clusters
        # (SLURM/OMPI/TPU pods); honour explicit env config everywhere else
        n = os.environ.get("JAX_NUM_PROCESSES")
        i = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(n) if n is not None else None,
            process_id=int(i) if i is not None else None)
