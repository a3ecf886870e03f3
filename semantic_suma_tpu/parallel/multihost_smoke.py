"""Multi-host smoke: global-mesh sharded SLAM step + DP segmenter train step.

Run one instance per process (see ``parallel/distributed.py``). Exercises the
cross-process collective path end-to-end: the sharded odometry step's psum'd
Gauss-Newton + all_gather render merge over a mesh spanning ALL processes,
and a data-parallel segmenter train step. Prints one "MULTIHOST OK" line per
process on success (the 2-process CPU test greps for it).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--cpu-devices-per-process", type=int, default=2)
    args = ap.parse_args(argv)

    if args.cpu_devices_per_process:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.cpu_devices_per_process}").strip()

    import jax
    if os.environ.get("SUMA_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from . import distributed
    distributed.initialize(args.coordinator, args.num_processes,
                           args.process_id)

    import jax.numpy as jnp
    import numpy as np

    ndev = jax.device_count()
    pid = args.process_id
    print(f"proc {pid}: {jax.local_device_count()} local / {ndev} global "
          f"devices", flush=True)

    from ..config import DataConfig, IcpConfig, MapConfig, SumaConfig
    from ..io.simulation import default_world, render_scan
    from ..models import rangenet as rn
    from ..models.segmenter import create_train_state
    from . import sharding as sh

    # ---- sharded SLAM odometry over the GLOBAL mesh ----------------------
    # Deliberately tiny arena + tiny active radius so the host-RAM spill
    # path (per-shard, process-local paging) is crossed in a 2-process run:
    # the circular trajectory fills the per-device arenas in a few scans
    # (pressure -> maybe_spill) and the second lap revisits the start
    # (ensure_resident pages chunks back in).
    from ..io.simulation import circular_trajectory
    height = 32 if 32 % ndev == 0 else ndev * 4
    d = DataConfig(width=128, height=height)
    # arena (6144 rows/device) >> active view (4096 rows/device): only
    # view-resident blocks are spill-exempt, so far blocks become eligible
    cfg = SumaConfig(data=d, model=d, icp=IcpConfig(max_iterations=3),
                     map=MapConfig(surfel_capacity=ndev * 6144,
                                   active_capacity=ndev * 4096, max_poses=64,
                                   submap_dimension=1, submap_extent=2.0,
                                   spill_margin=2.0, unspill_margin=12.0,
                                   spill_chunk_blocks=1))
    mesh = sh.make_mesh()
    slam = sh.ShardedSurfelSLAM(cfg, mesh)
    world = default_world(seed=0)
    n_scans = 24
    gt = circular_trajectory(n_scans, radius=4.0, step=2.1)
    max_spilled = 0
    for t in range(n_scans):
        scan = render_scan(world, jnp.asarray(gt[t]), cfg.data)
        info = slam.process_scan(scan.points, scan.labels, scan.probs,
                                 scan.valid)
        max_spilled = max(max_spilled, slam.spilled_rows)
    assert info["map-count"] > 0, "sharded fusion created no surfels"
    assert max_spilled > 0, "spill path was never crossed"
    paged_back = sum(m.chunks_paged_in for m in slam.spill)
    assert paged_back > 0, "no spilled chunk was ever paged back in"

    # ---- data-parallel segmenter train step over the global mesh ---------
    mesh2 = sh.make_mesh(axis="data")
    model = rn.small_rangenet()
    tx, tstate = create_train_state(model, jax.random.PRNGKey(0),
                                    (1, 16, 64, 5))
    train = sh.make_sharded_train_step(model, tx, mesh2)
    tstate = sh.shard_train_state(tstate, mesh2)
    batch = ndev
    with mesh2:
        tstate, metrics = train(
            tstate, jnp.zeros((batch, 16, 64, 5)),
            jnp.zeros((batch, 16, 64), jnp.int32),
            jnp.ones((batch, 16, 64), bool))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    print(f"MULTIHOST OK proc={pid} devices={ndev} "
          f"surfels={info['map-count']} max_spilled={max_spilled} "
          f"paged_back={paged_back} loss={loss:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
