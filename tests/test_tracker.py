"""Tracking GO early-stop parity (ref mipsfusion.py:536-556).

The while_loop GO must reproduce the reference's eager semantics
exactly: best-loss bookkeeping, thresh incrementing on non-improving
iters (iter 0 always counts as non-improving), and the break BEFORE the
gradient step once thresh > wait_iters.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mipsfusion_tpu.models import scene_rep as sr
from mipsfusion_tpu.ops.geometry import matrix_to_quaternion, qt_to_matrix
from mipsfusion_tpu.slam import tracker

from test_field import small_field_cfg


def _setup(n_rays=64, seed=0):
    fcfg = small_field_cfg()
    consts = sr.FieldConsts.from_norm_factor(jnp.asarray([3.0, 3.0, 3.0]))
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = sr.init_field_params(k1, fcfg)
    rays_d = jnp.concatenate(
        [jax.random.normal(k2, (n_rays, 2)) * 0.3, -jnp.ones((n_rays, 1))],
        axis=-1)
    target_rgb = jax.random.uniform(k3, (n_rays, 3))
    target_d = jnp.full((n_rays, 1), 2.0)
    pose0 = jnp.eye(4).at[0, 3].set(0.03)
    return fcfg, consts, params, rays_d, target_rgb, target_d, pose0


def _go_reference(field_params, fcfg, consts, gcfg, key, rays_d_cam,
                  target_rgb, target_d, initial_pose, n_iters, lw):
    """Eager Python-loop reimplementation of the reference's GO
    (ref mipsfusion.py:500-563) with identical optax pieces."""
    p = {"rot": matrix_to_quaternion(initial_pose[:3, :3]),
         "trans": initial_pose[:3, 3]}
    opt = optax.multi_transform(
        {"rot": optax.adam(gcfg.lr_rot), "trans": optax.adam(gcfg.lr_trans)},
        {"rot": "rot", "trans": "trans"})
    opt_state = opt.init(p)

    def loss_fn(pp, k):
        T = qt_to_matrix(pp["rot"], pp["trans"])
        rd = rays_d_cam @ T[:3, :3].T
        ro = jnp.broadcast_to(T[:3, 3], rd.shape)
        ret = sr.forward_losses(field_params, k, ro, rd, target_rgb,
                                target_d, fcfg, consts, emd_w=0.0)
        return sr.total_loss(ret, lw)

    keys = jax.random.split(key, max(n_iters, 1))
    best_loss, best_p, thresh = None, None, 0
    for i in range(n_iters):
        loss, g = jax.value_and_grad(loss_fn)(p, keys[i])
        loss_v = float(loss)
        if best_loss is None:
            best_loss, best_p = loss_v, p
        if loss_v < best_loss:
            best_loss, best_p, thresh = loss_v, p, 0
        else:
            thresh += 1
        if thresh > gcfg.wait_iters:
            break  # before the gradient step, like the reference
        updates, opt_state = opt.update(g, opt_state, p)
        p = optax.apply_updates(p, updates)

    p_final = best_p if gcfg.best else p
    return qt_to_matrix(p_final["rot"], p_final["trans"]), best_loss


@pytest.mark.parametrize("wait_iters", [0, 1, 100])
def test_go_early_stop_matches_reference_semantics(wait_iters):
    fcfg, consts, params, rays_d, rgb, d, pose0 = _setup()
    gcfg = tracker.GOConfig(n_iters=8, n_rays=64, lr_rot=0.01,
                            lr_trans=0.01, wait_iters=wait_iters)
    lw = sr.LossWeights()
    key = jax.random.PRNGKey(7)

    pose_jax, loss_jax = tracker.go_optimize(
        params, fcfg, consts, gcfg, key, rays_d, rgb, d, pose0, 8, lw)
    pose_ref, loss_ref = _go_reference(
        params, fcfg, consts, gcfg, key, rays_d, rgb, d, pose0, 8, lw)

    np.testing.assert_allclose(np.asarray(pose_jax), np.asarray(pose_ref),
                               atol=1e-5)
    assert abs(float(loss_jax) - loss_ref) < 1e-5


def test_go_wait_iters_large_runs_all_iters():
    """With patience >= n_iters the early stop must be a no-op: two
    different large patiences give bit-identical results."""
    fcfg, consts, params, rays_d, rgb, d, pose0 = _setup(seed=3)
    lw = sr.LossWeights()
    key = jax.random.PRNGKey(11)
    out = []
    for wait in (50, 100):
        gcfg = tracker.GOConfig(n_iters=6, n_rays=64, lr_rot=0.01,
                                lr_trans=0.01, wait_iters=wait)
        pose, loss = tracker.go_optimize(
            params, fcfg, consts, gcfg, key, rays_d, rgb, d, pose0, 6, lw)
        out.append((np.asarray(pose), float(loss)))
    np.testing.assert_array_equal(out[0][0], out[1][0])
    assert out[0][1] == out[1][1]


def test_go_improves_pose():
    """Sanity: GO moves the pose and returns a finite best loss."""
    fcfg, consts, params, rays_d, rgb, d, pose0 = _setup(seed=5)
    gcfg = tracker.GOConfig(n_iters=5, n_rays=64, lr_rot=0.01,
                            lr_trans=0.01)
    lw = sr.LossWeights()
    pose, loss = tracker.go_optimize(
        params, fcfg, consts, gcfg, jax.random.PRNGKey(1), rays_d, rgb,
        d, pose0, 5, lw)
    assert np.isfinite(np.asarray(pose)).all()
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(pose), np.asarray(pose0))
