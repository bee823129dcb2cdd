"""Matplotlib report generation (plots/ artifacts).

The reference's observability layer (SURVEY.md §5 "metrics/logging"):
  * background-model mask comparison grid
    (background_subtraction.py:296-340 → background_models_mask_comparisons.png)
  * intrinsic-calibration parameter/error comparison across runs
    (camera_calibration.py:612-705 → intrinsic_params_*.png)
  * marching-cubes surface snapshot (voxel_reconstruction.py:127-163)
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _savefig(fig, out_path: str):
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def plot_mask_comparison(
    masks_by_model: dict,  # {"KNN": (C, H, W), "MOG": ..., "MOG2": ...}
    out_path: str = "plots/background_models_mask_comparisons.png",
):
    """Cameras × models grid of extracted foreground masks."""
    models = list(masks_by_model.keys())
    num_cams = len(next(iter(masks_by_model.values())))
    fig, ax = plt.subplots(
        num_cams, len(models), figsize=(6 * len(models), 5 * num_cams),
        squeeze=False,
    )
    for c in range(num_cams):
        for m, name in enumerate(models):
            ax[c, m].set_title(f"Camera {c + 1} — {name}")
            ax[c, m].imshow(masks_by_model[name][c], cmap="gray")
            ax[c, m].axis("off")
    _savefig(fig, out_path)


def plot_intrinsic_results(
    runs: Sequence[dict],
    out_path: str = "plots/intrinsic_params_runs_comparison.png",
):
    """Compare calibration runs: mean/per-view errors + fx/fy/cx/cy ± std.

    Each run dict: {"label", "rms", "per_view_errors", "K", "intrinsic_std"}.
    """
    fig, axes = plt.subplots(1, 3, figsize=(18, 5))

    labels = [r["label"] for r in runs]
    axes[0].bar(labels, [r["rms"] for r in runs], color="tab:blue")
    axes[0].set_title("Mean reprojection error (px)")

    for r in runs:
        axes[1].plot(r["per_view_errors"], marker="o", label=r["label"])
    axes[1].set_title("Per-view reprojection error (px)")
    axes[1].set_xlabel("view")
    axes[1].legend()

    names = ["fx", "fy", "cx", "cy"]
    x = np.arange(len(names))
    width = 0.8 / max(len(runs), 1)
    for i, r in enumerate(runs):
        K = np.asarray(r["K"])
        vals = [K[0, 0], K[1, 1], K[0, 2], K[1, 2]]
        errs = np.asarray(r.get("intrinsic_std", np.zeros(9)))[:4]
        axes[2].bar(x + i * width, vals, width, yerr=errs, label=r["label"])
    axes[2].set_xticks(x + 0.4 - width / 2)
    axes[2].set_xticklabels(names)
    axes[2].set_title("Intrinsics ± std")
    axes[2].legend()

    _savefig(fig, out_path)


def plot_mesh_snapshot(
    tris: np.ndarray,
    out_path: str = "plots/marching_cubes.png",
    elev: float = 20.0,
    azim: float = -60.0,
):
    """3D triangle-mesh snapshot (plot_marching_cubes equivalent)."""
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(111, projection="3d")
    mesh = Poly3DCollection(tris, alpha=0.9)
    mesh.set_edgecolor("k")
    mesh.set_linewidth(0.1)
    ax.add_collection3d(mesh)
    lo = tris.reshape(-1, 3).min(0)
    hi = tris.reshape(-1, 3).max(0)
    ax.set_xlim(lo[0], hi[0])
    ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2], hi[2])
    ax.view_init(elev=elev, azim=azim)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    _savefig(fig, out_path)
