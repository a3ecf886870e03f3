"""Per-scan timing of the bench.py continuous-revisit loop lap, to find
where the time goes when the lap regresses (e.g. mid-window compiles)."""
import os
import sys
import time
from dataclasses import replace as _rp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core.pipeline import SurfelSLAM
from semantic_suma_tpu.io.simulation import (circular_trajectory,
                                             default_world, render_scan)


def main(warm=False):
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   min_fresh_rows=2 * 64 * 900,
                                   max_poses=8192))
    import os as _os
    vvf = float(_os.environ.get("VVF", "0.5"))
    loop_cfg = cfg.replace(loop=_rp(
        cfg.loop, min_trajectory_distance=60.0, delta_timestamp=20,
        search_distance=20.0, min_verifications=3, outlier_threshold=6.0,
        verify_view_fraction=vvf))
    n_lap, n_timed = 64, 60
    world = default_world(seed=0, extent=45.0)
    gt2 = circular_trajectory(n_lap + n_timed, radius=18.0, step=1.8)
    gen = jax.jit(lambda pose: render_scan(world, pose, cfg.data))
    scans2 = [jax.tree.map(lambda a: a.copy(), gen(gt2[i]))
              for i in range(n_lap + n_timed)]
    jax.block_until_ready(scans2[-1].points)

    slam = SurfelSLAM(loop_cfg)
    if warm:
        t0 = time.perf_counter()
        slam._loop.warmup(slam)
        print(f"warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    times = []
    per_scan_stages = {}
    for i in range(n_lap + n_timed):
        before = {k: v.total for k, v in slam.stopwatch.stats.items()}
        t0 = time.perf_counter()
        slam.process_scan_async(scans2[i].points, scans2[i].labels,
                                scans2[i].probs, scans2[i].valid)
        if i == n_lap - 1 or i == n_lap + n_timed - 1:
            slam.flush()
        times.append(time.perf_counter() - t0)
        if times[-1] > 0.018 and i >= n_lap:
            per_scan_stages[i] = {
                k: v.total - before.get(k, 0.0)
                for k, v in slam.stopwatch.stats.items()
                if v.total - before.get(k, 0.0) > 1e-3}
    lap2 = times[n_lap:]
    print(f"lap2 total {sum(lap2):.2f}s -> {n_timed/sum(lap2):.1f} scans/s; "
          f"closures={slam._loop.num_loop_closures} "
          f"opt={slam._loop.num_optimizations} "
          f"rebases={slam._loop.num_rebases}", file=sys.stderr)
    # top-10 slowest scans in the timed lap
    worst = sorted(range(len(lap2)), key=lambda i: -lap2[i])[:10]
    for i in worst:
        print(f"  scan {n_lap+i}: {lap2[i]*1e3:8.1f} ms", file=sys.stderr)
    print(f"  median {sorted(lap2)[len(lap2)//2]*1e3:.1f} ms", file=sys.stderr)
    print(slam.stopwatch.report(), file=sys.stderr)
    for i, st in per_scan_stages.items():
        pretty = ", ".join(f"{k}={v*1e3:.1f}ms" for k, v in
                           sorted(st.items(), key=lambda kv: -kv[1]))
        print(f"  slow scan {i}: {pretty}", file=sys.stderr)


if __name__ == "__main__":
    main(warm="--warm" in sys.argv)
