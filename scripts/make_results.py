"""Accuracy ledger: run the flagship synthetic configs and append RESULTS.md.

One command produces the round-over-round accuracy record (the analogue of
BENCH for correctness):

    python scripts/make_results.py --round 2            # full (TPU or CPU)
    python scripts/make_results.py --round 2 --quick    # smaller, CI-sized

Tracked rows (all on the synthetic raycast world — no KITTI data ships in
this environment, so these are the canonical numbers; the same CLI commands
run unchanged on a KITTI sequence directory):

  odometry   — 150 scans, loop closure off: ATE RMSE, t_rel, r_rel
  noisy      — same with 2 cm range noise
  loop       — 140-scan closing circle, loop closure on: final-position
               error after pose-graph optimization + ATE
  segmenter  — odometry driven by NETWORK labels (the KITTIReader.cpp:173-200
               contract) instead of ground truth, plus held-out mIoU

The reference publishes no numbers (BASELINE.md); the devkit metrics math is
the reference's own (`/root/reference/src/util/kitti_utils.cpp:75,149-191`).
"""
import argparse
import datetime
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_cli(args, env=None):
    cmd = [sys.executable, "-m", "semantic_suma_tpu.cli",
           "--cache-dir", os.path.join(REPO, ".cache", "jax")] + args
    e = dict(os.environ)
    if env:
        e.update(env)
    print("+", " ".join(cmd), file=sys.stderr)
    out = subprocess.run(cmd, capture_output=True, text=True, env=e,
                         cwd=REPO, timeout=3600)
    if out.returncode != 0:
        print(out.stdout, file=sys.stderr)
        print(out.stderr, file=sys.stderr)
        raise RuntimeError(f"CLI failed: {' '.join(args)}")
    return out.stdout, out.stderr


def last_json(stdout):
    """The CLI prints the metrics dict as the last JSON object on stdout."""
    dec = json.JSONDecoder()
    objs = []
    i = 0
    while i < len(stdout):
        j = stdout.find("{", i)
        if j < 0:
            break
        try:
            obj, end = dec.raw_decode(stdout[j:])
            objs.append(obj)
            i = j + end
        except ValueError:
            i = j + 1
    if not objs:
        raise RuntimeError(f"no JSON in CLI output:\n{stdout}")
    return objs[-1]


def scans_per_sec(stdout):
    """Prefer the steady-state figure (excludes one-time jit tracing /
    compile-cache loading); fall back to the whole-run number."""
    for line in stdout.splitlines():
        if "steady-state" in line and "scans/s]" in line:
            return float(line.split("steady-state")[-1].split(" scans/s")[0])
    for line in stdout.splitlines():
        if "scans/s)" in line:
            return float(line.split("(")[-1].split(" ")[0])
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--quick", action="store_true",
                    help="smaller scan counts / training budget")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (e.g. while the TPU is busy)")
    ap.add_argument("--out", default=os.path.join(REPO, "RESULTS.md"))
    args = ap.parse_args()
    if args.cpu:
        # propagate to every CLI subprocess (top-level --cpu flag)
        global run_cli
        _orig = run_cli
        run_cli = lambda a, env=None: _orig(["--cpu"] + a, env)

    n_odo = 60 if args.quick else 150
    n_loop = 80 if args.quick else 140
    seg_steps = 120 if args.quick else 400
    rows = {}

    with tempfile.TemporaryDirectory() as td:
        # 1. plain odometry (with the devkit per-length/per-speed error
        # breakdown — the reference's saveErrorPlots tl/rl/ts/rs outputs,
        # kitti_utils.cpp:149-191; VERDICT r4 #7)
        out, _ = run_cli(["run", "--synthetic", str(n_odo),
                          "--no-loop-closure", "--eval",
                          "--eval-breakdown"])
        m = last_json(out)
        rows["odometry"] = {"scans": n_odo, **m, "scans_per_sec":
                            scans_per_sec(out)}

        # 2. noisy odometry
        out, _ = run_cli(["run", "--synthetic", str(n_odo), "--noise", "0.02",
                          "--no-loop-closure", "--eval"])
        rows["noisy"] = {"scans": n_odo, **last_json(out)}

        # 3. loop closure (circle closes at ~113 scans with step=1.0);
        # scans/s here vs the odometry row quantifies the loop overhead
        # (VERDICT r2 #2: "loop overhead < 20%"). The default loop gates
        # target KITTI scale (min-trajectory-distance 200 m); this ~113 m
        # synthetic lap needs the tests' proven gates instead.
        loop_xml = os.path.join(td, "loop.xml")
        with open(loop_xml, "w") as f:
            f.write("""<config>
<param name="loop-min-trajectory-distance" type="float">60</param>
<param name="loop-delta-timestamp" type="integer">20</param>
<param name="loop-search-distance" type="float">20</param>
<param name="loop-min-verifications" type="integer">3</param>
<param name="loop-outlier-threshold" type="float">6.0</param>
</config>
""")
        sj = os.path.join(td, "loop_stats.json")
        out, _ = run_cli(["run", "--synthetic", str(n_loop),
                          "--config", loop_xml,
                          "--synthetic-step",
                          "1.0" if not args.quick else "1.6", "--eval",
                          "--stats-json", sj])
        with open(sj) as f:
            entries = [json.loads(line) for line in f if line.strip()]
        n_loops = max((e.get("loop-closures", 0) for e in entries), default=0)
        rows["loop"] = {"scans": n_loop, **last_json(out),
                        "scans_per_sec": scans_per_sec(out),
                        "loop_closures": n_loops}

        # 4. segmenter-in-loop: use the repo-versioned trained mid net when
        # present (weights/segmenter_synth_mid.pkl, the deployment
        # configuration — VERDICT r4 #3); else train one here (quick mode
        # trains the tiny net)
        wpath = os.path.join(REPO, "weights", "segmenter_synth_mid.pkl")
        miou = None
        if os.path.exists(wpath) and not args.quick:
            import json as _json
            meta = wpath + ".json"
            if os.path.exists(meta):
                miou = _json.load(open(meta)).get("val_miou")
        else:
            wpath = os.path.join(td, "seg.pkl")
            net = "--small" if args.quick else "--mid"
            out, _ = run_cli(["train-segmenter", "--synthetic",
                              "24" if args.quick else "96", net,
                              "--steps", str(seg_steps), "--out", wpath])
            miou = last_json(out)["val_miou"]
        out, _ = run_cli(["run", "--synthetic", str(n_odo),
                          "--movable-fraction", "0.3",
                          "--segmenter-weights", wpath,
                          "--no-loop-closure", "--eval"])
        rows["segmenter"] = {"scans": n_odo,
                             "val_miou": round(miou, 3) if miou else None,
                             "scans_per_sec": scans_per_sec(out),
                             **last_json(out)}

        # 4b. full darknet53 in the loop, when its trained weights are
        # versioned (weights/segmenter_synth_full.pkl) — validates the
        # reference's actual backbone depth (RangenetAPI.cpp:13-17)
        wfull = os.path.join(REPO, "weights", "segmenter_synth_full.pkl")
        if os.path.exists(wfull) and not args.quick:
            miou_f = None
            if os.path.exists(wfull + ".json"):
                miou_f = json.load(open(wfull + ".json")).get("val_miou")
            out, _ = run_cli(["run", "--synthetic", str(n_odo),
                              "--movable-fraction", "0.3",
                              "--segmenter-weights", wfull,
                              "--no-loop-closure", "--eval"])
            rows["segmenter-full"] = {
                "scans": n_odo,
                "val_miou": round(miou_f, 3) if miou_f else None,
                "scans_per_sec": scans_per_sec(out),
                **last_json(out)}

        # 5. sharded driver accuracy (8-virtual-device CPU mesh): the same
        # odometry workload through ShardedSurfelSLAM so sharded-vs-single
        # drift is a tracked number per round (VERDICT r3 #6)
        # >= 100 m of path so the devkit t_rel/r_rel segments exist
        # (VERDICT r4 weak #9: 50 scans x 1.5 m = 75 m gave nan)
        n_sh = 30 if args.quick else 90
        code = (
            "import os\n"
            "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS','') + "
            "' --xla_force_host_platform_device_count=8').strip()\n"
            "import jax, json\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import numpy as np, jax.numpy as jnp\n"
            "from semantic_suma_tpu.config import (SumaConfig, MapConfig, "
            "DataConfig)\n"
            "from dataclasses import replace\n"
            "from semantic_suma_tpu.parallel import sharding as sh\n"
            "from semantic_suma_tpu.io.simulation import SimulationReader\n"
            "from semantic_suma_tpu.utils import metrics\n"
            # half-width image + small arena: the 8-thread virtual mesh
            # oversubscribes host cores, and full-size collectives can hit
            # XLA's 40 s rendezvous timeout under load
            "d = DataConfig(width=450, height=32)\n"
            "cfg = SumaConfig(data=d, model=d)\n"
            "cfg = cfg.replace(map=replace(cfg.map, surfel_capacity=1<<18, "
            "active_capacity=1<<16, max_poses=256))\n"
            f"n = {n_sh}\n"
            "reader = SimulationReader(cfg.data, n_scans=n, radius=18.0, "
            "step=1.5)\n"
            "mesh = sh.make_mesh(8)\n"
            "slam = sh.ShardedSurfelSLAM(cfg, mesh, "
            "enable_loop_closure=False)\n"
            "for i in range(n):\n"
            "    s = reader.read(i)\n"
            "    slam.process_scan(s.points, s.labels, s.probs, s.valid)\n"
            "gt = np.asarray(reader.poses)\n"
            "print(json.dumps(metrics.evaluate(gt, slam.trajectory())))\n")
        import subprocess as sp
        pr = sp.run([sys.executable, "-c", code], capture_output=True,
                    text=True, cwd=REPO, timeout=3600)
        if pr.returncode != 0:
            # non-fatal: never lose the completed rows to a flaky virtual
            # 8-thread mesh (XLA CPU collectives can hit their 40 s
            # rendezvous timeout on oversubscribed hosts)
            print(pr.stdout[-2000:], pr.stderr[-2000:], file=sys.stderr)
            rows["sharded-8dev"] = {"scans": n_sh, "error": "run failed"}
        else:
            rows["sharded-8dev"] = {"scans": n_sh, **last_json(pr.stdout)}

    if args.cpu:
        backend = "cpu"
    else:
        import jax
        backend = jax.default_backend()
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")

    def fmt(v):
        return f"{v:.4f}" if isinstance(v, float) else str(v)

    lines = [f"\n## Round {args.round} — {stamp} ({backend}"
             f"{', quick' if args.quick else ''})\n",
             "| run | scans | ATE RMSE (m) | t_rel (%) | r_rel (deg/100m) |"
             " final err (m) | extra |",
             "|---|---|---|---|---|---|---|"]
    for name, r in rows.items():
        extra = ""
        if "val_miou" in r:
            extra = f"mIoU={r['val_miou']}"
            if r.get("scans_per_sec"):
                extra += f", {r['scans_per_sec']:.1f} scans/s"
        if name == "odometry" and r.get("scans_per_sec"):
            extra = f"{r['scans_per_sec']:.1f} scans/s"
        if name == "loop":
            bits = [f"loops={r.get('loop_closures', 0)}"]
            if r.get("scans_per_sec"):
                bits.append(f"{r['scans_per_sec']:.1f} scans/s")
            extra = ", ".join(bits)
        lines.append(
            f"| {name} | {r['scans']} | {fmt(r.get('ate_rmse_m', float('nan')))} "
            f"| {fmt(r.get('t_rel_percent', float('nan')))} "
            f"| {fmt(r.get('r_rel_deg_per_100m', float('nan')))} "
            f"| {fmt(r.get('final_error_m', float('nan')))} | {extra} |")

    # devkit per-segment-length / per-speed breakdown (odometry run) —
    # the reference devkit's saveErrorPlots tl/rl/ts/rs tables
    odo = rows.get("odometry", {})
    if odo.get("by_length"):
        lines += ["", "Devkit breakdown (odometry run):", "",
                  "| segment | t_rel (%) | r_rel (deg/100m) | n |",
                  "|---|---|---|---|"]
        for key, e in odo["by_length"].items():
            lines.append(f"| {key} | {e['t_rel_percent']:.4f} "
                         f"| {e['r_rel_deg_per_100m']:.4f} | {e['count']} |")
        for key, e in odo.get("by_speed", {}).items():
            lines.append(f"| {key} | {e['t_rel_percent']:.4f} "
                         f"| {e['r_rel_deg_per_100m']:.4f} | {e['count']} |")

    header = ("# RESULTS — accuracy ledger (synthetic raycast world)\n\n"
              "Round-over-round record of trajectory accuracy at the flagship "
              "64x900 operating point, produced by "
              "`python scripts/make_results.py --round N`. Metrics are the "
              "reference's own KITTI-devkit math "
              "(`/root/reference/src/util/kitti_utils.cpp:75,149-191`) plus "
              "ATE RMSE; the synthetic world is the canonical dataset here "
              "(no KITTI data in the environment — see BASELINE.md).\n")
    exists = os.path.exists(args.out)
    with open(args.out, "a") as f:
        if not exists:
            f.write(header)
        f.write("\n".join(lines) + "\n")
    print(f"appended round {args.round} to {args.out}")
    print(json.dumps(rows, indent=2, default=float))


if __name__ == "__main__":
    main()
