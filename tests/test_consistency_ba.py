"""SDF-consistency global BA (ref InactiveMap.global_BA_overlapping
:375-473): cross-submap SDF agreement on overlapping keyframes' rays
refines the submap anchors (first anchor fixed)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU
from test_slam_single import tiny_config

pytestmark = pytest.mark.slow


def test_consistency_ba_moves_only_free_anchors():
    from fixture_cache import cached_run
    n = 40
    cfg = tiny_config(n)
    cfg["use_manager"] = False

    def make_slam():
        ds = SyntheticDataset(cfg, n_frames=n, trajectory="orbit",
                              span=n / 200.0)
        return MIPSFusionTPU(cfg, dataset=ds)

    def compute(s):
        def frame(i):
            return {"frame_id": i, "c2w": s.dataset.gt_pose(i)}
        s.first_frame_mapping(frame(0), 60)
        for i in range(1, 25):
            s.process_frame(frame(i), i)
        return {}

    slam, _ = cached_run("consistency_ba_warm", cfg, make_slam, compute,
                         extra_files=(__file__,))

    # fabricate a second submap bound to keyframe 2 as an overlap:
    # kf 2 becomes an overlapping keyframe (ref=-2) bound to (0, 1),
    # submap 1 anchored at a slightly perturbed pose of submap 0
    st = slam.state
    slam.submap_params[1] = slam.initial_params
    slam._host_used = 2
    slam._host_kf_bind[2] = (0, 1)
    perturb = np.eye(4, dtype=np.float32)
    perturb[0, 3] = 0.05
    anchor1 = jnp.asarray(perturb) @ st.kf_c2w[0]
    st = st._replace(
        localMLP_info=st.localMLP_info.at[1, 0].set(1.0),
        localMLP_first_kf=st.localMLP_first_kf.at[1].set(1),
        keyframe_ref=st.keyframe_ref.at[2].set(-2),
        keyframe_localMLP=st.keyframe_localMLP.at[2].set(
            jnp.asarray([0, 1], jnp.int32)),
        kf_c2w=st.kf_c2w.at[1].set(anchor1),
    )
    slam.state = st

    anchors_before = np.asarray(slam.state.kf_c2w[:2]).copy()
    slam.global_ba_consistency(n_iters=5, n_rays=128)
    anchors_after = np.asarray(slam.state.kf_c2w[:2])

    # anchor 0 (submap 0) is fixed; anchor 1 must move and stay finite
    assert np.allclose(anchors_before[0], anchors_after[0])
    assert not np.allclose(anchors_before[1], anchors_after[1])
    assert np.isfinite(anchors_after).all()
    # rotation part stays a valid rotation (optimized via quaternions)
    R = anchors_after[1][:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-3)
