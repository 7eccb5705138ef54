"""Logger: full-image re-rendering, comparison grids, trajectory plots.

Parity with the reference Logger's observability outputs
(/root/reference/Logger.py:193-262 render_full_img / img_render_save;
/root/reference/tools/eval_ate.py:103-131 plot_traj): volumetric
re-render of a full frame through the active field, a 2x2 GT-vs-render
comparison PNG, and a top-down trajectory plot.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import scene_rep as sr


def render_full_img(params: Dict, fcfg: sr.FieldConfig,
                    consts: sr.FieldConsts, c2w_local: jnp.ndarray,
                    rays_dir_img: jnp.ndarray, depth_img: jnp.ndarray,
                    key: jax.Array, chunk: int = 16384):
    """Re-render a full frame (rgb, depth) through the field
    (ref Logger.render_full_img :193-214)."""
    H, W, _ = rays_dir_img.shape
    dirs = rays_dir_img.reshape(-1, 3)
    rays_d = dirs @ c2w_local[:3, :3].T
    rays_o = jnp.broadcast_to(c2w_local[:3, 3], rays_d.shape)
    target_d = depth_img.reshape(-1, 1)

    rgbs, depths = [], []
    for s in range(0, rays_d.shape[0], chunk):
        ret = sr.render_rays(params, key, rays_o[s:s + chunk],
                             rays_d[s:s + chunk], target_d[s:s + chunk],
                             fcfg, consts)
        rgbs.append(np.asarray(ret["rgb"]))
        depths.append(np.asarray(ret["depth"]))
    rgb = np.concatenate(rgbs).reshape(H, W, 3)
    depth = np.concatenate(depths).reshape(H, W)
    return rgb, depth


def img_render_save(params: Dict, fcfg: sr.FieldConfig,
                    consts: sr.FieldConsts, c2w_local: jnp.ndarray,
                    rgb_gt: np.ndarray, depth_gt: np.ndarray,
                    rays_dir_img: jnp.ndarray, out_dir: str,
                    frame_id: int, key: Optional[jax.Array] = None):
    """2x2 comparison grid: GT rgb/depth vs rendered rgb/depth
    (ref Logger.img_render_save :221-262). Returns (psnr, depth_l1)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    key = key if key is not None else jax.random.PRNGKey(0)
    rgb, depth = render_full_img(params, fcfg, consts, c2w_local,
                                 jnp.asarray(rays_dir_img),
                                 jnp.asarray(depth_gt), key)
    mse = float(np.mean((rgb - rgb_gt) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    valid = depth_gt > 0
    depth_l1 = float(np.abs(depth - depth_gt)[valid].mean()) \
        if valid.any() else 0.0

    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    vmax = max(float(depth_gt.max()), 1e-3)
    axes[0, 0].imshow(np.clip(rgb_gt, 0, 1)); axes[0, 0].set_title("GT RGB")
    axes[0, 1].imshow(depth_gt, cmap="plasma", vmin=0, vmax=vmax)
    axes[0, 1].set_title("GT depth")
    axes[1, 0].imshow(np.clip(rgb, 0, 1))
    axes[1, 0].set_title(f"render RGB (psnr {psnr:.1f})")
    axes[1, 1].imshow(depth, cmap="plasma", vmin=0, vmax=vmax)
    axes[1, 1].set_title(f"render depth (L1 {depth_l1:.3f} m)")
    for ax in axes.ravel():
        ax.axis("off")
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(os.path.join(out_dir, f"render_{frame_id:05d}.png"),
                dpi=90, bbox_inches="tight")
    plt.close(fig)
    return psnr, depth_l1


def plot_traj(gt: np.ndarray, est: np.ndarray, out_path: str,
              title: str = "") -> None:
    """Top-down (x, z) trajectory plot (ref tools/eval_ate.py:103-131)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.plot(gt[:, 0, 3], gt[:, 2, 3], "k-", label="ground truth")
    ax.plot(est[:, 0, 3], est[:, 2, 3], "b-", label="estimated")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend()
    ax.set_title(title)
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
