"""Training losses: free-space / truncation SDF losses + EMD classification.

Behavioral parity with /root/reference/helper_functions/utils.py:21-111
(get_masks / get_sdf_loss / compute_loss), including the reference's exact
scalings (EMD terms divided by 250 and 5000) and the mean-over-all-elements
convention for the masked regression terms.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse2psnr(x):
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def compute_loss(prediction, target, loss_type: str = "l2"):
    if loss_type == "l2":
        return jnp.mean((prediction - target) ** 2)
    elif loss_type == "l1":
        return jnp.mean(jnp.abs(prediction - target))
    raise ValueError(f"Unsupported loss type {loss_type}")


def get_masks(z_vals, target_d, truncation):
    """Free-space / truncation-region masks and their relative weights.

    z_vals: [B, S]; target_d: [B, 1]; returns (front_mask, sdf_mask,
    fs_weight, sdf_weight) with mask shapes [B, S].
    """
    front_mask = jnp.where(z_vals < (target_d - truncation), 1.0, 0.0)
    back_mask = jnp.where(z_vals > (target_d + truncation), 1.0, 0.0)
    depth_mask = jnp.where(target_d > 0.0, 1.0, 0.0)
    sdf_mask = (1.0 - front_mask) * (1.0 - back_mask) * depth_mask

    num_fs = jnp.count_nonzero(front_mask).astype(z_vals.dtype)
    num_sdf = jnp.count_nonzero(sdf_mask).astype(z_vals.dtype)
    num = num_fs + num_sdf
    fs_weight = 1.0 - num_fs / num
    sdf_weight = 1.0 - num_sdf / num
    return front_mask, sdf_mask, fs_weight, sdf_weight


def get_sdf_loss(z_vals, target_d, predicted_sdf, sdf_prob, truncation,
                 cate_num: int = 5, emd_w: float = 0.01,
                 loss_type: str = "l2"):
    """Free-space + truncation-region SDF losses, optionally with the EMD
    classification terms.

    z_vals/predicted_sdf: [B, S]; target_d: [B, 1]; sdf_prob: [B, S, C].
    Returns (fs_loss, sdf_loss) scalars.
    """
    max_class_id = cate_num - 1
    front_mask, sdf_mask, fs_weight, sdf_weight = get_masks(
        z_vals, target_d, truncation)

    fs_loss2 = compute_loss(predicted_sdf * front_mask,
                            jnp.ones_like(predicted_sdf) * front_mask,
                            loss_type) * fs_weight
    sdf_loss2 = compute_loss((z_vals + predicted_sdf * truncation) * sdf_mask,
                             target_d * sdf_mask, loss_type) * sdf_weight

    if emd_w > 0:
        index_range = jnp.arange(cate_num, dtype=z_vals.dtype)

        # free-space EMD: predicted class should be max_class_id
        fs_all = sdf_prob * (max_class_id - index_range) * front_mask[..., None]
        fs_loss1 = jnp.mean(jnp.sum(fs_all, axis=-1)) / 250.0

        # truncation-region EMD: penalize distance to the gt class
        gt_class = (((target_d - z_vals) + truncation)
                    / (2.0 * truncation)) * max_class_id
        sdf_all = (jnp.abs(gt_class[:, :, None] - index_range[None, None, :])
                   * sdf_mask[..., None] * sdf_prob)
        sdf_loss1 = jnp.mean(jnp.sum(sdf_all, axis=-1)) / 5000.0

        fs_loss = fs_loss2 + fs_loss1 * emd_w
        sdf_loss = sdf_loss2 + sdf_loss1 * emd_w
    else:
        fs_loss, sdf_loss = fs_loss2, sdf_loss2

    return fs_loss, sdf_loss


def get_sdf_loss_T(z_vals, target_d, predicted_sdf, sdf_probT, truncation,
                   cate_num: int = 5, emd_w: float = 0.01,
                   loss_type: str = "l2"):
    """get_sdf_loss with class-major probabilities.

    z_vals/predicted_sdf: [B, S]; target_d: [B, 1]; sdf_probT: [C, B, S]
    (the fused kernel's native row layout — see scene_rep.render_rays_T).
    Identical reductions to get_sdf_loss, with the class axis leading so
    nothing is transposed at size.
    """
    max_class_id = cate_num - 1
    front_mask, sdf_mask, fs_weight, sdf_weight = get_masks(
        z_vals, target_d, truncation)

    fs_loss2 = compute_loss(predicted_sdf * front_mask,
                            jnp.ones_like(predicted_sdf) * front_mask,
                            loss_type) * fs_weight
    sdf_loss2 = compute_loss((z_vals + predicted_sdf * truncation) * sdf_mask,
                             target_d * sdf_mask, loss_type) * sdf_weight

    if emd_w > 0:
        index_range = jnp.arange(cate_num, dtype=z_vals.dtype)

        fs_all = (sdf_probT * (max_class_id - index_range)[:, None, None]
                  * front_mask[None])
        fs_loss1 = jnp.mean(jnp.sum(fs_all, axis=0)) / 250.0

        gt_class = (((target_d - z_vals) + truncation)
                    / (2.0 * truncation)) * max_class_id
        sdf_all = (jnp.abs(gt_class[None] - index_range[:, None, None])
                   * sdf_mask[None] * sdf_probT)
        sdf_loss1 = jnp.mean(jnp.sum(sdf_all, axis=0)) / 5000.0

        fs_loss = fs_loss2 + fs_loss1 * emd_w
        sdf_loss = sdf_loss2 + sdf_loss1 * emd_w
    else:
        fs_loss, sdf_loss = fs_loss2, sdf_loss2

    return fs_loss, sdf_loss


# ---------------------------------------------------------------------------
# Cross-submap consistency losses (legacy SDF-consistency global BA path,
# ref /root/reference/helper_functions/geometry_helper.py:225-236 and
# InactiveMap.get_SDF_dif :149-192)
# ---------------------------------------------------------------------------

def sdf_consistency_loss(pred_sdf1, pred_sdf2, mask):
    """Mean squared SDF difference over valid rays
    (ref compute_avg_SDF_difference)."""
    loss = jnp.sum(jnp.square(pred_sdf1 * mask - pred_sdf2 * mask))
    n = jnp.count_nonzero(mask).astype(pred_sdf1.dtype) + 0.001
    return loss / n


def rgb_consistency_loss(pred_rgb1, pred_rgb2, mask):
    """Mean squared per-ray photometric L1 over valid rays
    (ref compute_avg_RGB_difference)."""
    per_ray = jnp.where(mask[..., 0] > 0,
                        jnp.sum(jnp.abs(pred_rgb1 - pred_rgb2), axis=-1),
                        0.0)
    n = jnp.count_nonzero(mask).astype(pred_rgb1.dtype) + 0.001
    return jnp.sum(jnp.square(per_ray)) / n


def cross_submap_consistency(params1, params2, fcfg, consts1, consts2,
                             rays_d_cam, target_d, pose_local1,
                             pose_local2, rgb_weight: float = 0.0):
    """SDF (+ optional RGB) consistency of two submaps on shared surface
    points (ref InactiveMap.get_SDF_dif :149-166): back-project the rays
    in each submap's local frame, query both fields at the surface
    points, and penalize disagreement. Used by the legacy
    SDF-consistency global BA (ref global_BA_overlapping :375-473)."""
    from ..models import scene_rep as sr

    def surface_pts(pose):
        dirs = rays_d_cam @ pose[:3, :3].T
        return pose[:3, 3] + dirs * target_d

    out1 = sr.run_network(params1, surface_pts(pose_local1), fcfg, consts1)
    out2 = sr.run_network(params2, surface_pts(pose_local2), fcfg, consts2)
    mask = (target_d > 0).astype(out1.dtype)
    loss = sdf_consistency_loss(out1[..., 3:4], out2[..., 3:4], mask)
    if rgb_weight > 0:
        loss = loss + rgb_weight * rgb_consistency_loss(
            out1[..., :3], out2[..., :3], mask)
    return loss
