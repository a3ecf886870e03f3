"""Headless command-line driver.

The reference has NO headless mode — its Qt GUI is the only entry point and
batch evaluation means clicking play and exporting poses
(``/root/reference/src/visualizer/visualizer.cpp``,
``VisualizerWindow.cpp:848-891``). This CLI provides the batch path:

  python -m semantic_suma_tpu.cli run --dataset /path/to/sequences/00 \
      --export-poses est.txt --eval --save-map map.ply
  python -m semantic_suma_tpu.cli run --synthetic 200 --eval
  python -m semantic_suma_tpu.cli eval --gt poses/00.txt --est est.txt
  python -m semantic_suma_tpu.cli train-segmenter --dataset ... --out w.pkl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _add_common(p):
    p.add_argument("--config", help="reference-format XML config file")
    p.add_argument("--approach", choices=["frame-to-model", "frame-to-frame"],
                   default=None)
    p.add_argument("--no-semantics", action="store_true")
    p.add_argument("--no-loop-closure", action="store_true")
    p.add_argument("--max-scans", type=int, default=None)
    p.add_argument("--surfel-capacity", type=int, default=1 << 21)
    p.add_argument("--active-capacity", type=int, default=1 << 18)
    p.add_argument("--sharded", type=int, default=None, metavar="N",
                   help="run the multi-chip driver over an N-device mesh")


def build_config(args):
    from dataclasses import replace

    from .config import SumaConfig, config_from_xml
    cfg = SumaConfig()
    if args.config:
        cfg = config_from_xml(args.config, cfg)
    # keep any XML-provided map parameters; only override capacities.
    # min_fresh_rows sizing (measured on the 140/150-scan ledger runs):
    # a 1-image fresh region forces a view refresh every few scans (the
    # r4 CLI ran ~2x slower than bench.py for exactly this reason); a
    # 2-image region displaces enough map blocks from the active view to
    # clip the rendered model periphery, which costs 0.8 deg/100m of
    # r_rel through LOOP VERIFICATION ICP (the verify-view fraction is
    # NOT the cause — 1.0 at 2-image fresh shows the same kink). Pure
    # odometry barely notices the clip (ATE 0.0026 vs 0.0022) but loses
    # 3.4x throughput at 1.5 images (refresh churn on the chunked
    # path) — so: loops on -> 1.5 images (accuracy), loops off -> 2
    # (throughput).
    hw = cfg.data.height * cfg.data.width
    loop_on = cfg.loop.enabled and not args.no_loop_closure
    fresh = hw + hw // 2 if loop_on else 2 * hw
    cfg = cfg.replace(map=replace(
        cfg.map,
        surfel_capacity=args.surfel_capacity,
        active_capacity=args.active_capacity,
        min_fresh_rows=min(fresh, args.active_capacity // 2),
        max_poses=max(8192, (args.max_scans or 8192))))
    if args.approach:
        cfg = cfg.replace(approach=args.approach)
    if args.no_semantics:
        cfg = cfg.replace(semantic=cfg.semantic.__class__(enabled=False))
    if args.no_loop_closure:
        cfg = cfg.replace(loop=cfg.loop.__class__(enabled=False))
    return cfg


def save_map_ply(path: str, state, map_cfg, min_confidence: float = 0.0) -> None:
    """Export world-frame surfels as a PLY point cloud with normals,
    radius, confidence and semantic color (the reference's renderMaps dump,
    VisualizerWindow.cpp:815-840, minus the GUI)."""
    from .core.surfel_map import sync
    from .models.labels import label_colors
    d = sync(state.map, map_cfg).data
    valid = np.asarray(d.valid) & (np.asarray(d.confidence) >= min_confidence)
    pos = np.asarray(d.wpos)[valid]
    nrm = np.asarray(d.wnormal)[valid]
    rad = np.asarray(d.radius)[valid]
    conf = np.asarray(d.confidence)[valid]
    lab = np.asarray(d.sem_label)[valid]
    rgb = label_colors(lab)
    # binary PLY: the python per-line ASCII writer took minutes at map
    # scale (2M surfels); the structured-array dump is one write
    rec = np.empty(pos.shape[0], dtype=[
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
        ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
        ("radius", "<f4"), ("confidence", "<f4"),
        ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    rec["x"], rec["y"], rec["z"] = pos.T
    rec["nx"], rec["ny"], rec["nz"] = nrm.T
    rec["radius"], rec["confidence"] = rad, conf
    rec["red"], rec["green"], rec["blue"] = rgb.T
    with open(path, "wb") as f:
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               f"element vertex {pos.shape[0]}\n")
        for c in ("x", "y", "z", "nx", "ny", "nz"):
            hdr += f"property float {c}\n"
        hdr += ("property float radius\nproperty float confidence\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        f.write(hdr.encode())
        f.write(rec.tobytes())
    print(f"wrote {pos.shape[0]} surfels to {path}")


def jax_tree_to_np(tree):
    import jax
    return jax.tree.map(np.asarray, tree)


def save_cloud_ply(path: str, cloud: np.ndarray) -> None:
    """Plain xyz point-cloud PLY (aggregated raw scans, no surfel attrs)."""
    with open(path, "wb") as f:
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               f"element vertex {cloud.shape[0]}\n"
               "property float x\nproperty float y\nproperty float z\n"
               "end_header\n")
        f.write(hdr.encode())
        f.write(np.ascontiguousarray(cloud[:, :3], "<f4").tobytes())
    print(f"wrote {cloud.shape[0]} points to {path}")


def cmd_run(args) -> int:
    from .core.pipeline import SurfelSLAM
    from .utils import metrics

    cfg = build_config(args)
    gt = None

    if args.synthetic:
        from .io.simulation import SimulationReader, default_world
        n = args.synthetic
        world = default_world(seed=0,
                              movable_fraction=args.movable_fraction)
        reader = SimulationReader(cfg.data, n_scans=n, world=world,
                                  radius=args.synthetic_radius,
                                  noise_sigma=args.noise,
                                  step=args.synthetic_step)
        gt = np.asarray(reader.poses)
        count = n

        segmenter = None
        if args.segmenter_weights:
            from .models.segmenter import Segmenter
            segmenter = Segmenter.load(args.segmenter_weights, cfg.data)

        def get_scan(i):
            s = reader.read(i)
            if segmenter is not None:
                # labels from the NETWORK, not ground truth — the
                # KITTIReader.cpp:173-200 contract on synthetic data
                labels, probs = segmenter(s.points)
                return s.points, labels, probs, s.valid
            return s.points, s.labels, s.probs, s.valid
    else:
        from .io.kitti import KITTIReader
        segmenter = None
        if args.segmenter_weights:
            from .models.segmenter import Segmenter
            segmenter = Segmenter.load(args.segmenter_weights, cfg.data)
        reader = KITTIReader(args.dataset, segmenter=segmenter,
                             use_gt_labels=not args.no_gt_labels)
        gt = reader.gt_poses()
        count = reader.count()

        def get_scan(i):
            s = reader.read(i)
            return s.points, s.labels, s.probs, None

    count = min(count, args.max_scans or count)
    if args.sharded:
        # multi-chip driver over a jax.sharding.Mesh (SURVEY §7 configs
        # 4-5); on hosts without enough devices use
        # XLA_FLAGS=--xla_force_host_platform_device_count=N with --cpu
        from .parallel import sharding as shp
        mesh = shp.make_mesh(args.sharded)
        if args.resume:
            from .utils.checkpoint import load_checkpoint_sharded
            slam = load_checkpoint_sharded(args.resume, cfg, mesh)
            start = len(slam.poses)
            print(f"resumed sharded at scan {start} from {args.resume}",
                  file=sys.stderr)
        else:
            slam = shp.ShardedSurfelSLAM(cfg, mesh)
            start = 0
    elif args.resume:
        from .utils.checkpoint import load_checkpoint
        slam = load_checkpoint(args.resume, cfg)
        start = len(slam.poses)
        print(f"resumed at scan {start} from {args.resume}", file=sys.stderr)
    else:
        slam = SurfelSLAM(cfg)
        start = 0

    evlog = None
    if args.stats_json:
        from .utils.eventlog import EventLog
        # mode="w": each run produces a self-contained JSONL file (append
        # would mix records from a previous run at the same path, and
        # consumers like scripts/make_results.py count records as scans)
        evlog = EventLog("run", args.stats_json, mode="w")

    accum = None
    if args.save_cloud:
        from .utils.scan_accumulator import ScanAccumulator
        accum = ScanAccumulator(history_size=count,
                                stride=max(1, count // 200))

    # pipelined driver: up to pipeline_depth scans in flight (hides the
    # device->host round trip); loop-closure runs drain to synchronous
    # operation automatically whenever the state machine is active
    use_async = True
    from collections import deque
    pend_pts: deque = deque()
    pend_valid: deque = deque()

    def on_stats(stats):
        # fires per finished scan from inside the (possibly pipelined /
        # chunked) driver, in scan order
        idx_d = len(slam.statistics) - 1
        if evlog is not None:
            evlog.log("scan", idx=idx_d, **stats)
        if accum is not None:
            accum.insert(pend_pts.popleft(), slam.poses[-1],
                         pend_valid.popleft())
        if args.verbose and idx_d % 10 == 0:
            print(f"scan {idx_d}/{count}: iters={stats['icp-iterations']} "
                  f"map={stats['map-count']} "
                  f"loops={stats.get('loop-closures', 0)}", file=sys.stderr)

    slam.stats_callback = on_stats
    if getattr(slam, "_loop", None) is not None \
            and getattr(slam, "supports_fused_verify", False):
        # compile/cache-load every loop-phase program BEFORE the drive
        # (otherwise they hit mid-verification-window; the reference's
        # analogous startup cost is its TensorRT engine build)
        t_w = time.perf_counter()
        slam._loop.warmup(slam)
        print(f"loop programs warmed in {time.perf_counter() - t_w:.1f}s",
              file=sys.stderr)
    t0 = time.perf_counter()
    t_steady = None  # timer restarted after warmup/compile scans
    steady_at = start + 10
    for i in range(start, count):
        if i == steady_at:
            t_steady = time.perf_counter()
        pts, labels, probs, valid = get_scan(i)
        if accum is not None:
            pend_pts.append(pts)
            pend_valid.append(valid)
        if use_async:
            slam.process_scan_async(pts, labels, probs, valid)
        else:
            slam.process_scan(pts, labels, probs, valid)
    if use_async:
        slam.flush()
    if hasattr(slam, "finalize"):
        slam.finalize()  # final pose-graph solve over ALL edges
    wall = time.perf_counter() - t0
    n_done = count - start
    est = slam.trajectory()
    msg = (f"processed {n_done} scans in {wall:.1f}s "
           f"({n_done / max(wall, 1e-9):.2f} scans/s)")
    if t_steady is not None and count - steady_at >= 20:
        # first scans pay one-time jit tracing / compile-cache loading;
        # steady-state is the comparable throughput number
        sps = (count - steady_at) / max(time.perf_counter() - t_steady, 1e-9)
        msg += f" [steady-state {sps:.2f} scans/s]"
    print(msg)
    sw = getattr(slam, "stopwatch", None)
    if args.verbose and sw is not None:
        # per-stage wall-clock statistics (the reference's Stopwatch table,
        # VisualizerWindow.cpp:874-890)
        print(sw.report(), file=sys.stderr)
    if evlog is not None and sw is not None:
        evlog.log("stage-times", **{k: v["mean_ms"] for k, v in
                                    sw.summary().items()})

    if args.save_checkpoint:
        from .utils.checkpoint import save_checkpoint
        save_checkpoint(slam, args.save_checkpoint)
        print(f"checkpoint -> {args.save_checkpoint}", file=sys.stderr)

    if args.export_poses:
        from .io.kitti import save_poses
        tr = getattr(reader, "tr", None)
        save_poses(args.export_poses, est, tr)
        print(f"poses -> {args.export_poses}")

    if evlog is not None:
        evlog.close()

    if args.save_map:
        if hasattr(slam, "state"):
            save_map_ply(args.save_map, slam.state, cfg.map)
        else:
            print("--save-map: sharded sessions are exported per shard via "
                  "--save-checkpoint; PLY export is single-chip only",
                  file=sys.stderr)

    if args.save_viewer:
        if hasattr(slam, "state"):
            from .utils.viz3d import export_map_html
            export_map_html(args.save_viewer, slam.state, cfg.map,
                            trajectory=est)
        else:
            print("--save-viewer is single-chip only", file=sys.stderr)

    if accum is not None:
        save_cloud_ply(args.save_cloud, accum.world_cloud(max_points=2_000_000))

    if args.plot_dir:
        from .utils import viz
        os.makedirs(args.plot_dir, exist_ok=True)
        loops = [i for i, s_ in enumerate(slam.statistics)
                 if s_.get("loop-verifying")]
        viz.plot_trajectory(est, np.asarray(gt) if gt is not None else None,
                            loops, os.path.join(args.plot_dir, "traj.png"))
        viz.plot_statistics(slam.statistics,
                            path=os.path.join(args.plot_dir, "stats.png"))
        viz.save_map_images(
            jax_tree_to_np(slam.state.model_maps if hasattr(slam, "state")
                           else slam.model_maps),
            prefix=os.path.join(args.plot_dir, "model"))

    if args.eval and gt is not None:
        res = metrics.evaluate(np.asarray(gt), est,
                               breakdown=args.eval_breakdown)
        if args.eval_breakdown and args.plot_dir:
            from .utils import viz
            viz.plot_error_breakdown(
                res["by_length"], res["by_speed"],
                path=os.path.join(args.plot_dir, "errors.png"))
        print(json.dumps(res, indent=2))
    return 0


def cmd_eval(args) -> int:
    from .io.kitti import load_poses, parse_calib
    from .utils import metrics
    tr = parse_calib(args.calib).get("Tr") if args.calib else None
    gt = load_poses(args.gt, tr)
    est = load_poses(args.est, tr)
    res = metrics.evaluate(gt, est, breakdown=args.eval_breakdown)
    if args.plot_dir:
        from .utils import viz
        os.makedirs(args.plot_dir, exist_ok=True)
        viz.plot_trajectory(est, gt,
                            path=os.path.join(args.plot_dir, "traj.png"))
        if args.eval_breakdown:
            viz.plot_error_breakdown(
                res["by_length"], res["by_speed"],
                path=os.path.join(args.plot_dir, "errors.png"))
    print(json.dumps(res, indent=2))
    return 0


def cmd_train_segmenter(args) -> int:
    if args.synthetic:
        from .config import DataConfig
        from .models import rangenet as rn
        from .models.segmenter import train_synthetic
        cfg = DataConfig()
        model = (rn.small_rangenet() if args.small
                 else rn.mid_rangenet() if args.mid else rn.RangeNet())
        seg, miou = train_synthetic(
            cfg, n_train=args.synthetic, n_val=max(4, args.synthetic // 8),
            steps=args.steps, batch=args.batch, lr=args.lr, seed=args.seed,
            model=model, log=lambda *a: print(*a, file=sys.stderr))
        seg.save(args.out)
        print(json.dumps({"val_miou": miou, "weights": args.out}))
        return 0 if miou > 0.5 else 1

    from .io.kitti import KITTIReader
    from .models import rangenet as rn
    from .models.segmenter import train_kitti
    from .config import DataConfig

    cfg = DataConfig()
    model = (rn.small_rangenet() if args.small
             else rn.mid_rangenet() if args.mid else rn.RangeNet())
    reader = KITTIReader(args.dataset, use_gt_labels=True)
    if reader.label_files is None:
        print("ERROR: no SemanticKITTI labels found", file=sys.stderr)
        return 1
    seg, miou = train_kitti(
        reader, cfg, epochs=args.epochs, batch=args.batch, lr=args.lr,
        seed=args.seed, model=model, val_fraction=args.val_fraction,
        log=lambda *a: print(*a, file=sys.stderr))
    seg.save(args.out)
    print(json.dumps({"val_miou": miou, "weights": args.out}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="semantic_suma_tpu")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (overrides any plugin that "
                         "set jax_platforms at import time)")
    ap.add_argument("--cache-dir", default=None,
                    help="persistent XLA compilation cache directory")
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run SLAM over a sequence")
    _add_common(runp)
    runp.add_argument("--dataset", help="KITTI sequence directory")
    runp.add_argument("--synthetic", type=int, default=None,
                      help="use N synthetic raycast scans instead")
    runp.add_argument("--synthetic-radius", type=float, default=18.0)
    runp.add_argument("--synthetic-step", type=float, default=1.0,
                      help="arc length per synthetic scan (m)")
    runp.add_argument("--noise", type=float, default=0.0)
    runp.add_argument("--movable-fraction", type=float, default=0.0,
                      help="fraction of synthetic boxes labeled 'car'")
    runp.add_argument("--segmenter-weights")
    runp.add_argument("--no-gt-labels", action="store_true")
    runp.add_argument("--export-poses")
    runp.add_argument("--stats-json",
                      help="per-scan statistics as a JSONL event log")
    runp.add_argument("--save-map")
    runp.add_argument("--save-viewer",
                      help="standalone interactive 3D map viewer HTML "
                           "(WebGL; surfels + trajectory + car glyph)")
    runp.add_argument("--save-cloud",
                      help="aggregated world-frame raw-scan cloud PLY")
    runp.add_argument("--save-checkpoint",
                      help="write a resumable session checkpoint at the end")
    runp.add_argument("--resume",
                      help="resume from a checkpoint written by "
                           "--save-checkpoint (same config/capacities)")
    runp.add_argument("--plot-dir",
                      help="write trajectory/statistics/map-image PNGs here")
    runp.add_argument("--eval", action="store_true")
    runp.add_argument("--eval-breakdown", action="store_true",
                      help="add the devkit per-segment-length and "
                           "per-speed error tables to --eval output")
    runp.add_argument("--verbose", action="store_true")
    runp.set_defaults(fn=cmd_run)

    evalp = sub.add_parser("eval", help="evaluate a pose file against GT")
    evalp.add_argument("--gt", required=True)
    evalp.add_argument("--est", required=True)
    evalp.add_argument("--calib")
    evalp.add_argument("--plot-dir",
                       help="write devkit path/error plots (the reference's "
                            "savePathPlot/saveErrorPlots outputs) here")
    evalp.add_argument("--eval-breakdown", action="store_true",
                       help="add per-segment-length / per-speed tables")
    evalp.set_defaults(fn=cmd_eval)

    trainp = sub.add_parser("train-segmenter")
    trainp.add_argument("--dataset",
                        help="KITTI sequence dir (omit with --synthetic)")
    trainp.add_argument("--synthetic", type=int, default=None,
                        help="train on N synthetic raycast scans instead")
    trainp.add_argument("--out", required=True)
    trainp.add_argument("--epochs", type=int, default=1)
    trainp.add_argument("--steps", type=int, default=300,
                        help="training steps (synthetic mode)")
    trainp.add_argument("--batch", type=int, default=4)
    trainp.add_argument("--lr", type=float, default=1e-3)
    trainp.add_argument("--seed", type=int, default=0)
    trainp.add_argument("--val-fraction", type=float, default=0.1,
                        help="held-out fraction for mIoU (dataset mode)")
    trainp.add_argument("--small", action="store_true")
    trainp.add_argument("--mid", action="store_true",
                        help="darknet21-depth deployment net (see "
                             "models.rangenet.mid_rangenet)")
    trainp.set_defaults(fn=cmd_train_segmenter)

    args = ap.parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if args.cmd == "run" and not (args.dataset or args.synthetic):
        ap.error("run requires --dataset or --synthetic")
    if args.cmd == "train-segmenter" and not (args.dataset or args.synthetic):
        ap.error("train-segmenter requires --dataset or --synthetic")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
