"""Training-curve + 3D pose/point-cloud plots (matplotlib, headless).

Parity targets:
- ``plot_results`` — the reference's yolo/yolov7/utils/plots.py
  plot_results (:397+): a grid of per-metric training curves. The
  reference parses its whitespace results.txt; ours reads the
  MetricLogger JSONL (utils/logging.py), auto-discovering the numeric
  series, so every train CLI's run directory plots with one call.
- ``plot_3d_pose`` / ``plot_point_cloud`` — the reference's
  rootnet/vis_tool.py 3D matplotlib tooling (draw_pose :~200+, pcl
  scatter helpers): 3D hand skeleton + optional point cloud / mesh
  vertex scatter, saved as PNG (Agg; no display needed).

All functions return the output path.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hamer_yolo_tpu.utils.viz import HAND_SKELETON


def _load_jsonl(path: str) -> List[Dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return rows


def plot_results(log_dir_or_jsonl: str, out: Optional[str] = None,
                 keys: Optional[Sequence[str]] = None,
                 max_cols: int = 4) -> str:
    """Training curves from a MetricLogger JSONL -> results.png.

    ``keys`` limits which series are plotted (default: every float key
    except step/time). Equivalent of the reference's plot_results grid
    (yolov7/utils/plots.py:397)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = log_dir_or_jsonl
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    rows = _load_jsonl(path)
    if not rows:
        raise ValueError(f"no metric rows in {path}")

    series: Dict[str, Tuple[List[float], List[float]]] = {}
    for r in rows:
        step = float(r.get("step", len(series)))
        for k, v in r.items():
            if k in ("step", "time") or not isinstance(v, (int, float)):
                continue
            if keys is not None and k not in keys:
                continue
            series.setdefault(k, ([], []))
            series[k][0].append(step)
            series[k][1].append(float(v))
    if not series:
        raise ValueError(f"no numeric series in {path}")

    names = sorted(series)
    ncols = min(max_cols, len(names))
    nrows = -(-len(names) // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for i, name in enumerate(names):
        ax = axes[i // ncols][i % ncols]
        xs, ys = series[name]
        ax.plot(xs, ys, linewidth=1.2)
        ax.set_title(name, fontsize=10)
        ax.set_xlabel("step", fontsize=8)
        ax.grid(True, alpha=0.3)
    for j in range(len(names), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    out = out or os.path.join(os.path.dirname(path), "results.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_3d_pose(joints: np.ndarray, out: str,
                 skeleton: Sequence[Tuple[int, int]] = HAND_SKELETON,
                 pcl: Optional[np.ndarray] = None,
                 title: str = "hand pose") -> str:
    """3D skeleton (21, 3) [+ optional point cloud (N, 3)] -> PNG.

    The reference's vis_tool.draw_pose 3D branch: bones as colored line
    segments, joints as scatter, equal-ish axes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    joints = np.asarray(joints, np.float64)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    if pcl is not None:
        pcl = np.asarray(pcl, np.float64)
        ax.scatter(pcl[:, 0], pcl[:, 1], pcl[:, 2], s=1, c="lightgray",
                   alpha=0.5, depthshade=False)
    cmap = plt.get_cmap("tab10")
    for ei, (a, b) in enumerate(skeleton):
        seg = joints[[a, b]]
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2],
                color=cmap((ei // 4) % 10), linewidth=2)
    ax.scatter(joints[:, 0], joints[:, 1], joints[:, 2], s=14, c="black",
               depthshade=False)
    # equal aspect: cube around the data
    ref = np.concatenate([joints] + ([pcl] if pcl is not None else []))
    c = ref.mean(0)
    r = max(float(np.ptp(ref - c, axis=0).max()) / 2.0, 1e-6)
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    ax.set_title(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_point_cloud(pcl: np.ndarray, out: str,
                     color_by: Optional[np.ndarray] = None,
                     title: str = "point cloud") -> str:
    """(N, 3) scatter -> PNG (vis_tool pcl plotting equivalent);
    ``color_by`` is an (N,) scalar mapped through viridis."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pcl = np.asarray(pcl, np.float64)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    kw = {"c": color_by, "cmap": "viridis"} if color_by is not None else \
         {"c": "steelblue"}
    ax.scatter(pcl[:, 0], pcl[:, 1], pcl[:, 2], s=2, depthshade=False, **kw)
    ax.set_title(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
