"""Frame-to-keyframe drift gate + ICP rescue (tracker.DriftGateConfig).

The round-5 seed-lottery study showed fast-motion divergence is a
gradual basin slide that both the EWMA-relative gates AND the neural
map absorb (tools/diag_absres.py: median |SDF| residual of the live map
stays ~4 mm while the pose error passes 100 mm). The drift gate
compares the current depth image against the last keyframe's stored
cloud — immutable sensor data — so the slip since the keyframe shows up
as an absolute point-to-plane residual in meters, and a point-to-plane
ICP against that cloud can undo it. These tests inject a known slip
into the pose chain and check the gate (a) measures it, (b) rescues it,
and (c) stays quiet on healthy poses.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.models import scene_rep as sr
from mipsfusion_tpu.slam import tracker

from test_field import small_field_cfg
from test_slam_single import tiny_config


def _yaw_slip(deg, t):
    a = np.radians(deg)
    T = np.eye(4)
    T[0, 0] = T[2, 2] = np.cos(a)
    T[0, 2] = np.sin(a)
    T[2, 0] = -np.sin(a)
    T[:3, 3] = t
    return T


def _gate_setup(slip, kf_i=0, cur_i=5):
    cfg = tiny_config(n_frames=8)
    ds = SyntheticDataset(cfg, n_frames=8, trajectory="orbit",
                          span=8 / 200.0)
    packed_kf = ds.packed(kf_i)
    packed_cur = ds.packed(cur_i)
    dgcfg = tracker.DriftGateConfig(thresh=0.02, polish=False)
    pts, normals, valid = tracker.gate_anchor(
        packed_kf, dgcfg.anchor_rows, dgcfg.anchor_cols)

    gt_kf = np.asarray(ds.gt_pose(kf_i))
    gt_cur = np.asarray(ds.gt_pose(cur_i))
    slipped = gt_cur @ slip

    est = jnp.tile(jnp.eye(4), (16, 1, 1))
    est = est.at[kf_i].set(jnp.asarray(gt_kf))
    # pred (motion model, const_speed off) = est[cur-1]; with RO and GO
    # both at 0 iters the pre-gate pose IS the slipped pose
    est = est.at[cur_i - 1].set(jnp.asarray(slipped))
    est = est.at[cur_i].set(jnp.asarray(slipped))

    fcfg = small_field_cfg()
    consts = sr.FieldConsts.from_norm_factor(jnp.asarray([3.0, 3.0, 3.0]))
    params = sr.init_field_params(jax.random.PRNGKey(0), fcfg)
    rcfg = tracker.ROConfig(particle_size=8, n_rows=4, n_cols=6, n_iters=0)
    gcfg = tracker.GOConfig(n_iters=0, n_rays=64)
    pst = tracker.make_pst(jax.random.PRNGKey(1), rcfg)

    res = tracker.track_frame(
        params, fcfg, consts, rcfg, gcfg, pst, jax.random.PRNGKey(2),
        packed_cur[..., 3:6], packed_cur[..., 6], packed_cur[..., :3],
        est, jnp.asarray(cur_i), jnp.asarray(False), sr.LossWeights(),
        0, 0, dgcfg=dgcfg, gate_pts=pts, gate_normals=normals,
        gate_valid=valid, gate_kf_frame=jnp.asarray(kf_i, jnp.int32))
    return res, gt_cur, slipped


def test_gate_quiet_on_healthy_pose():
    res, gt_cur, _ = _gate_setup(np.eye(4))
    # exact synthetic depth at the exact pose: residual is the anchor
    # sampling floor, far below the 20 mm threshold
    assert float(res.drift_res) < 0.02
    assert not bool(res.rescued)
    np.testing.assert_allclose(np.asarray(res.pose), gt_cur, atol=1e-5)


def test_gate_measures_slip():
    slip = _yaw_slip(0.0, [0.06, 0.0, 0.0])
    res, _, _ = _gate_setup(slip)
    # a 60 mm translation slip must register as tens of mm of
    # point-to-plane residual (rescue may then shrink it)
    assert bool(res.rescued)


def test_rescue_recovers_translation_slip():
    slip = _yaw_slip(0.0, [0.06, 0.0, 0.0])
    res, gt_cur, slipped = _gate_setup(slip)
    err_before = np.linalg.norm(slipped[:3, 3] - gt_cur[:3, 3])
    err_after = np.linalg.norm(
        np.asarray(res.pose)[:3, 3] - gt_cur[:3, 3])
    assert bool(res.rescued)
    assert err_after < 0.25 * err_before, (err_before, err_after)
    assert float(res.drift_res) < 0.02


def test_rescue_recovers_rotation_slip():
    slip = _yaw_slip(3.0, [0.02, 0.0, -0.03])
    res, gt_cur, _ = _gate_setup(slip)
    R = np.asarray(res.pose)[:3, :3] @ gt_cur[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
    assert bool(res.rescued)
    assert ang < 1.0, ang
    assert float(res.drift_res) < 0.02


def test_disarmed_anchor_never_fires():
    slip = _yaw_slip(0.0, [0.1, 0.0, 0.0])
    cfg = tiny_config(n_frames=8)
    ds = SyntheticDataset(cfg, n_frames=8, trajectory="orbit",
                          span=8 / 200.0)
    dgcfg = tracker.DriftGateConfig(thresh=0.02, polish=False)
    pts, normals, valid = tracker.gate_anchor(
        ds.packed(0), dgcfg.anchor_rows, dgcfg.anchor_cols)
    gt_cur = np.asarray(ds.gt_pose(5))
    slipped = jnp.asarray(gt_cur @ slip)
    est = jnp.tile(jnp.eye(4), (16, 1, 1)).at[4].set(slipped)
    fcfg = small_field_cfg()
    consts = sr.FieldConsts.from_norm_factor(jnp.asarray([3.0, 3.0, 3.0]))
    params = sr.init_field_params(jax.random.PRNGKey(0), fcfg)
    rcfg = tracker.ROConfig(particle_size=8, n_rows=4, n_cols=6, n_iters=0)
    gcfg = tracker.GOConfig(n_iters=0, n_rays=64)
    pst = tracker.make_pst(jax.random.PRNGKey(1), rcfg)
    packed_cur = ds.packed(5)
    res = tracker.track_frame(
        params, fcfg, consts, rcfg, gcfg, pst, jax.random.PRNGKey(2),
        packed_cur[..., 3:6], packed_cur[..., 6], packed_cur[..., :3],
        est, jnp.asarray(5), jnp.asarray(False), sr.LossWeights(),
        0, 0, dgcfg=dgcfg, gate_pts=pts, gate_normals=normals,
        gate_valid=valid, gate_kf_frame=jnp.asarray(-1, jnp.int32))
    assert not bool(res.rescued)
    np.testing.assert_allclose(np.asarray(res.pose),
                               np.asarray(slipped), atol=1e-6)


@pytest.mark.slow
def test_system_runs_with_gate_enabled():
    """Whole tiny SLAM loop with the gate on: anchors lay down at
    keyframe cadence, the healthy trajectory never fires the gate, and
    accuracy matches the gate-off baseline."""
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = tiny_config(n_frames=24)
    cfg["tracking"]["drift_gate"] = {"thresh": 0.05, "anchor_rows": 20,
                                     "anchor_cols": 26}
    ds = SyntheticDataset(cfg, n_frames=24, trajectory="orbit",
                          span=24 / 200.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    for i in range(24):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)
    ate = slam.evaluate(23)["absolute_translational_error.rmse"]
    assert np.isfinite(float(ate))
    assert float(ate) < 0.03, float(ate)
    assert int(slam._gate_kf_frame) >= 18   # anchors kept refreshing
