"""MoE observability: expert-emotion attribution, MaxVio load-balance logs,
confusion-matrix plots.

The reference implements these as global mutable counters written from
inside model forward (reference: ``third_party/log_experts.py``,
``third_party/log_maxvio.py``, hooks at ``model/moe.py:183-188,249-286``)
plus seaborn plotting (``log_experts.py:78-138``,
``third_party/plot_conf_matrix.py``). Here the counters come OUT of the
jitted step as the flax "metrics" collection; this module aggregates and
renders them host-side.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..core.constants import EMOTION_CLASSES


def collect_moe_metrics(metrics_tree) -> Dict[str, Dict[str, np.ndarray]]:
    """Flatten a "metrics" variable collection into
    {layer_path: {metric_name: array}}."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    flat = jax.tree_util.tree_leaves_with_path(metrics_tree)
    for path, leaf in flat:
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        layer = "/".join(keys[:-1])
        out.setdefault(layer, {})[keys[-1]] = np.asarray(leaf)
    return out


def save_expert_emotion(metrics_tree, out_dir: str = "log",
                        basename: str = "experts_emotion_count") -> List[str]:
    """Dump per-layer (6, E) expert-emotion counts as JSON files, one per
    MoE layer (reference: log_experts.py:78-96 writes
    experts_emotion_count{i}.json)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    layers = [(k, v["expert_emotion_counts"])
              for k, v in sorted(collect_moe_metrics(metrics_tree).items())
              if "expert_emotion_counts" in v]
    for i, (layer, counts) in enumerate(layers):
        p = os.path.join(out_dir, f"{basename}{i}.json")
        with open(p, "w") as f:
            json.dump({"layer": layer,
                       "emotions": list(EMOTION_CLASSES),
                       "counts": counts.tolist()}, f, indent=2)
        paths.append(p)
    return paths


def plot_expert_emotion_heatmaps(metrics_tree, out_dir: str = "log",
                                 basename: str = "experts_emotion_plot"
                                 ) -> List[str]:
    """Per-layer heatmaps of expert usage by dominant emotion
    (reference: log_experts.py:98-138, seaborn -> matplotlib here)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    layers = [(k, v["expert_emotion_counts"])
              for k, v in sorted(collect_moe_metrics(metrics_tree).items())
              if "expert_emotion_counts" in v]
    for i, (layer, counts) in enumerate(layers):
        row_sum = counts.sum(axis=1, keepdims=True)
        norm = np.divide(counts, np.maximum(row_sum, 1e-9))
        fig, ax = plt.subplots(figsize=(1.2 * counts.shape[1] + 2, 5))
        im = ax.imshow(norm, aspect="auto", cmap="viridis")
        ax.set_yticks(range(6), EMOTION_CLASSES)
        ax.set_xticks(range(counts.shape[1]),
                      [f"e{j}" for j in range(counts.shape[1])])
        ax.set_title(f"expert usage by emotion — {layer}")
        for r in range(norm.shape[0]):
            for c in range(norm.shape[1]):
                ax.text(c, r, f"{norm[r, c]:.2f}", ha="center", va="center",
                        color="w", fontsize=8)
        fig.colorbar(im)
        p = os.path.join(out_dir, f"{basename}{i}.png")
        fig.savefig(p, bbox_inches="tight", dpi=100)
        plt.close(fig)
        paths.append(p)
    return paths


class MaxVioLog:
    """Accumulate per-batch MaxVio values and save as .npy
    (reference: third_party/log_maxvio.py:12-55)."""

    def __init__(self):
        self.values: List[float] = []

    def update(self, metrics_tree) -> None:
        for v in collect_moe_metrics(metrics_tree).values():
            if "maxvio" in v:
                self.values.append(float(v["maxvio"]))

    def save(self, path: str = "log/maxvio.npy") -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path, np.asarray(self.values, np.float32))
        return path


def plot_confusion_matrix(cm: np.ndarray, labels=None, title: str = "",
                          out_path: Optional[str] = None,
                          normalize: bool = True):
    """Render one confusion matrix (reference: run_model_vevo.py:454-566
    saves chord/root/quality matrices as png+npy)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = cm.astype(np.float64)
    if normalize:
        m = m / np.maximum(m.sum(axis=1, keepdims=True), 1e-9)
    fig, ax = plt.subplots(figsize=(8, 7))
    im = ax.imshow(m, cmap="Blues")
    ax.set_title(title)
    ax.set_xlabel("predicted")
    ax.set_ylabel("target")
    if labels is not None and len(labels) <= 20:
        ax.set_xticks(range(len(labels)), labels, rotation=90, fontsize=7)
        ax.set_yticks(range(len(labels)), labels, fontsize=7)
    fig.colorbar(im)
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        return out_path
    return fig


def compare_confusion_matrices(cm_a: np.ndarray, cm_b: np.ndarray,
                               labels=None, names=("run A", "run B"),
                               out_path: Optional[str] = None):
    """Side-by-side comparison of two runs' confusion matrices
    (reference: third_party/plot_conf_matrix.py:84-112)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(21, 6))
    for ax, m, name in zip(axes[:2], (cm_a, cm_b), names):
        mm = m / np.maximum(m.sum(axis=1, keepdims=True), 1e-9)
        ax.imshow(mm, cmap="Blues")
        ax.set_title(name)
    diff = (cm_a / np.maximum(cm_a.sum(1, keepdims=True), 1e-9)
            - cm_b / np.maximum(cm_b.sum(1, keepdims=True), 1e-9))
    im = axes[2].imshow(diff, cmap="RdBu", vmin=-1, vmax=1)
    axes[2].set_title(f"{names[0]} - {names[1]}")
    fig.colorbar(im, ax=axes[2])
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        return out_path
    return fig
