"""Offline visualization: trajectory plots, range-image strips, map exports.

The reference's entire L5 layer is an interactive Qt5/OpenGL GUI
(``/root/reference/src/visualizer/``: ViewportWidget 3D draw, GraphWidget
time-series, renderMaps texture dumps). A TPU batch engine wants offline
artifacts instead: this module renders the same information — trajectories
vs ground truth with loop-closure markers, per-scan statistics time series
(the GraphWidget curves), and depth/normal/semantic map images — to PNG
files with matplotlib, plus the PLY surfel export in ``cli.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_trajectory(est: np.ndarray, gt: Optional[np.ndarray] = None,
                    loop_frames: Sequence[int] = (), path: str = "traj.png",
                    title: str = "trajectory") -> None:
    """Bird's-eye XY trajectory plot (the devkit's gnuplot path plot,
    kitti_utils.cpp savePathPlot analogue)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 8))
    if gt is not None:
        ax.plot(gt[:, 0, 3], gt[:, 1, 3], "k--", lw=1, label="ground truth")
    ax.plot(est[:, 0, 3], est[:, 1, 3], "b-", lw=1, label="estimate")
    ax.plot(est[0, 0, 3], est[0, 1, 3], "go", ms=8, label="start")
    for f in loop_frames:
        if f < len(est):
            ax.plot(est[f, 0, 3], est[f, 1, 3], "r*", ms=10)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend()
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_statistics(statistics: list[dict], keys: Sequence[str] = (
        "icp-iterations", "icp-error", "map-count", "complete-time"),
        path: str = "stats.png") -> None:
    """Per-scan statistics time series (the GraphWidget live plots,
    VisualizerWindow.cpp:701-714)."""
    plt = _plt()
    keys = [k for k in keys if statistics and k in statistics[0]]
    fig, axes = plt.subplots(len(keys), 1, figsize=(10, 2.2 * len(keys)),
                             sharex=True)
    if len(keys) == 1:
        axes = [axes]
    for ax, key in zip(axes, keys):
        ax.plot([s.get(key, np.nan) for s in statistics], lw=0.8)
        ax.set_ylabel(key, fontsize=8)
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("scan")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_error_breakdown(by_length: dict, by_speed: dict,
                         path: str = "errors.png") -> None:
    """Devkit error plots: t_rel / r_rel vs segment length and vs speed
    (the reference devkit's saveErrorPlots tl/rl/ts/rs gnuplot outputs,
    kitti_utils.cpp:149-191), as four small-multiple panels. Input dicts
    come from ``metrics.evaluate(..., breakdown=True)``.

    One metric per panel (no dual axes — t_rel %% and r_rel deg/100m are
    different scales); each metric keeps one hue across both rows."""
    plt = _plt()
    t_hue, r_hue = "#3B5FC0", "#B04A3E"  # t_rel blue, r_rel red-brown
    rows = [("segment length", by_length), ("speed bucket", by_speed)]
    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    for r, (xlabel, table) in enumerate(rows):
        keys = list(table.keys())
        x = np.arange(len(keys))
        for c, (field, label, hue) in enumerate(
                (("t_rel_percent", "t_rel [%]", t_hue),
                 ("r_rel_deg_per_100m", "r_rel [deg/100m]", r_hue))):
            ax = axes[r][c]
            y = [table[k][field] for k in keys]
            ax.plot(x, y, "-o", color=hue, lw=2, ms=5)
            ax.set_xticks(x, keys, fontsize=7, rotation=30)
            ax.set_ylabel(label, fontsize=8)
            ax.set_xlabel(xlabel, fontsize=8)
            ax.grid(alpha=0.3)
            if not keys:
                ax.text(0.5, 0.5, "no segments", ha="center", va="center",
                        transform=ax.transAxes, color="0.5")
    fig.suptitle("KITTI-devkit segment errors")
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def save_map_images(maps, prefix: str = "frame") -> list[str]:
    """Dump depth / normal / semantic map images of a Maps pytree (the
    renderMaps texture dump, VisualizerWindow.cpp:815-840)."""
    from ..models.labels import label_colors
    plt = _plt()
    out = []

    depth = np.linalg.norm(np.asarray(maps.vertex), axis=-1)
    valid = np.asarray(maps.vertex_valid)
    depth = np.where(valid, depth, np.nan)
    fig, ax = plt.subplots(figsize=(12, 2))
    ax.imshow(depth, cmap="turbo", aspect="auto")
    ax.axis("off")
    p = f"{prefix}_depth.png"
    fig.savefig(p, dpi=120, bbox_inches="tight")
    plt.close(fig)
    out.append(p)

    normal = (np.asarray(maps.normal) * 0.5 + 0.5)
    normal = np.where(valid[..., None], normal, 0.0)
    fig, ax = plt.subplots(figsize=(12, 2))
    ax.imshow(normal, aspect="auto")
    ax.axis("off")
    p = f"{prefix}_normals.png"
    fig.savefig(p, dpi=120, bbox_inches="tight")
    plt.close(fig)
    out.append(p)

    sem = label_colors(np.asarray(maps.sem_label))
    sem = np.where(valid[..., None], sem, 0)
    fig, ax = plt.subplots(figsize=(12, 2))
    ax.imshow(sem, aspect="auto")
    ax.axis("off")
    p = f"{prefix}_semantics.png"
    fig.savefig(p, dpi=120, bbox_inches="tight")
    plt.close(fig)
    out.append(p)
    return out
