"""Multi-host initialization + smoke entry.

The reference is strictly single-process/single-GPU (SURVEY §2.7 — its only
concurrency is one std::async pose-graph thread, ``/root/reference/src/core/
SurfelMapping.cpp:655-660``). Scale-out across hosts is therefore a NEW
TPU-native component: ``jax.distributed`` process groups + a global device
mesh over which the sharded SLAM step and segmenter training run unchanged
(shard_map collectives ride ICI within a host and DCN across hosts).

Usage (one command per host / process):

    python -m semantic_suma_tpu.parallel.multihost_smoke \
        --coordinator host0:12355 --num-processes 2 --process-id {0,1}

On CPU (tests / laptops) the Gloo collectives backend is selected
automatically; on real TPU pods the default (XLA/ICI) backend is used.
"""

from __future__ import annotations

import os


def initialize(coordinator: str = "localhost:12355",
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX process group.

    On TPU pods with auto-detection (GKE/Borg metadata) all arguments may be
    None. For manual bring-up pass coordinator address + process count + id.
    CPU backends get Gloo collectives so multi-process CPU works (used by
    the 2-process smoke test).
    """
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") or \
            jax.config.jax_platforms in ("cpu", "cpu,"):
        os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax: env var alone is enough
            pass
    jax.distributed.initialize(coordinator, num_processes, process_id)


def is_initialized() -> bool:
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover
        return False
