"""Checkpoint save/load round-trip + mid-sequence resume."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.checkpoint import load_ckpt, save_ckpt
from mipsfusion_tpu.slam.system import MIPSFusionTPU
from test_slam_single import tiny_config

pytestmark = pytest.mark.slow


def test_ckpt_roundtrip(tmp_path):
    from mipsfusion_tpu.slam import state as slam_state
    cap = slam_state.StateCapacity(n_frames=10, n_keyframes=4,
                                   n_submaps=2, rays_per_kf=8,
                                   kf_rays_h=2, kf_rays_w=4)
    st = slam_state.init_state(cap, [2.0, 2.0, 2.0])
    st = st._replace(n_kf=jnp.asarray(2, jnp.int32),
                     kf_frame_ids=st.kf_frame_ids.at[0].set(0).at[1].set(5))
    params = {"planes": {"s0": jnp.ones((3, 4, 4, 2))},
              "decoder": {"w": jnp.arange(6.0).reshape(2, 3)}}
    save_ckpt(str(tmp_path / "ckpt_x"), st, [params, None])
    st2, sp2, extra = load_ckpt(str(tmp_path / "ckpt_x"))
    assert int(st2.n_kf) == 2
    np.testing.assert_array_equal(np.asarray(st2.kf_frame_ids),
                                  np.asarray(st.kf_frame_ids))
    np.testing.assert_allclose(np.asarray(sp2[0]["planes"]["s0"]),
                               np.asarray(params["planes"]["s0"]))
    np.testing.assert_allclose(np.asarray(sp2[0]["decoder"]["w"]),
                               np.asarray(params["decoder"]["w"]))
    assert sp2[1] is None


def test_mid_sequence_resume(tmp_path):
    """Run half a sequence, checkpoint, resume in a fresh system, and
    finish — the resumed run must stay accurate. The reference has no
    mid-sequence resume (SURVEY §5.4); this is a capability beyond it."""
    cfg = tiny_config(18)
    cfg["mapping"]["first_iters"] = 120
    cfg["data"] = {"downsample": 1, "sc_factor": 1.0,
                   "output": str(tmp_path), "exp_name": "resume"}
    ds = SyntheticDataset(cfg, n_frames=18, trajectory="orbit",
                          span=18 / 200.0)

    slam1 = MIPSFusionTPU(cfg, dataset=ds)
    for i in range(12):
        slam1.process_frame(ds[i], i)
    ckpt_dir = slam1.save_checkpoint("mid")

    slam2 = MIPSFusionTPU(cfg, dataset=ds)
    start = slam2.resume_from(ckpt_dir)
    # resume point = last keyframe's frame + 1
    n_kf = int(slam2.state.n_kf)
    expected = int(slam2.state.kf_frame_ids[n_kf - 1]) + 1
    assert start == expected

    results = slam2.run(n_frames=18, verbose=False, start=start)
    assert results["absolute_translational_error.rmse"] < 0.08, results


def test_resume_rebuilds_host_mirrors_and_refines(tmp_path):
    """VERDICT r3 #1 regression: resume_from must rebuild the host
    mirrors (_host_used/_host_n_kf/_host_kf_bind) from the restored
    SlamState — without them a restored run silently no-ops background
    refinement (inactive_refine_step) and consistency-BA
    (global_ba_consistency iterates range(_host_n_kf) == range(0))."""
    import jax

    cfg = tiny_config(18)
    cfg["mapping"]["first_iters"] = 120
    cfg["data"] = {"downsample": 1, "sc_factor": 1.0,
                   "output": str(tmp_path), "exp_name": "resume_mirrors"}
    ds = SyntheticDataset(cfg, n_frames=18, trajectory="orbit",
                          span=18 / 200.0)

    slam1 = MIPSFusionTPU(cfg, dataset=ds)
    for i in range(13):
        slam1.process_frame(ds[i], i)

    # fabricate a second submap as a 2-submap run would leave it: kf 1 is
    # its (overlapping) first keyframe, bound to (0, 1), and kf 2 is an
    # ordinary keyframe FIRST-bound to submap 1 — without such a kf the
    # ownership rule (skip keyframes first-bound to the active submap,
    # the functional keyframe_mutex_mask) correctly leaves the inactive
    # refine with no work
    st = slam1.state
    assert int(st.n_kf) >= 3  # kfs at frames 0, 6, 12
    slam1.submap_params[1] = slam1.initial_params
    perturb = np.eye(4, dtype=np.float32)
    perturb[0, 3] = 0.05
    anchor1 = jnp.asarray(perturb) @ st.kf_c2w[0]
    slam1.state = st._replace(
        localMLP_info=st.localMLP_info.at[1, 0].set(1.0),
        localMLP_first_kf=st.localMLP_first_kf.at[1].set(1),
        keyframe_ref=st.keyframe_ref.at[1].set(-2)
                                    .at[2].set(1),
        keyframe_localMLP=st.keyframe_localMLP.at[1].set(
            jnp.asarray([0, 1], jnp.int32))
                                              .at[2].set(
            jnp.asarray([1, -1], jnp.int32)),
        kf_c2w=st.kf_c2w.at[1].set(anchor1),
    )
    ckpt_dir = slam1.save_checkpoint("mid")

    slam2 = MIPSFusionTPU(cfg, dataset=ds)
    slam2.resume_from(ckpt_dir)

    # mirrors rebuilt from the restored state
    assert slam2._host_used == 2
    assert slam2._host_n_kf == int(slam2.state.n_kf) and slam2._host_n_kf
    np.testing.assert_array_equal(
        slam2._host_kf_bind, np.asarray(slam2.state.keyframe_localMLP))
    assert slam2.inactive_started

    # background refinement actually mutates the inactive submap
    inactive = 1 if slam2.active_id == 0 else 0
    before = jax.tree.leaves(slam2.submap_params[inactive])[0].copy()
    slam2.inactive_refine_step(13)
    after = jax.tree.leaves(slam2.submap_params[inactive])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), \
        "inactive_refine_step was a no-op after resume"

    # consistency-BA actually moves the free anchor
    anchors_before = np.asarray(slam2.state.kf_c2w[:2]).copy()
    slam2.global_ba_consistency(n_iters=3, n_rays=64)
    anchors_after = np.asarray(slam2.state.kf_c2w[:2])
    assert np.allclose(anchors_before[0], anchors_after[0])
    assert not np.allclose(anchors_before[1], anchors_after[1]), \
        "global_ba_consistency was a no-op after resume"


def test_opt_state_roundtrip(tmp_path):
    """Adam moments survive the checkpoint: the restored optimizer state
    equals the saved one leaf-for-leaf (the reference's checkpoints drop
    optimizer state entirely, ref Logger.py:42-69)."""
    import jax
    import optax
    from mipsfusion_tpu.slam import state as slam_state
    from mipsfusion_tpu.slam.checkpoint import load_opt_state

    cap = slam_state.StateCapacity(n_frames=10, n_keyframes=4,
                                   n_submaps=2, rays_per_kf=8,
                                   kf_rays_h=2, kf_rays_w=4)
    st = slam_state.init_state(cap, [2.0, 2.0, 2.0])
    params = {"planes": {"s0": jnp.ones((3, 4, 4, 2))},
              "decoder": {"w": jnp.arange(6.0).reshape(2, 3)}}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    # take two steps so mu/nu are non-trivial
    for _ in range(2):
        g = jax.tree.map(jnp.ones_like, params)
        upd, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, upd)

    save_ckpt(str(tmp_path / "ck"), st, [params, None],
              opt_state=opt_state)
    template = opt.init(params)
    restored = load_opt_state(str(tmp_path / "ck"), template)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # structurally incompatible template -> clean None (fresh fallback)
    other = optax.adam(1e-2).init({"x": jnp.ones((5,))})
    assert load_opt_state(str(tmp_path / "ck"), other) is None
