"""Integration test: single-submap SLAM on a short synthetic sequence.

Runs the full track->map->keyframe loop on a tiny config (small images,
small hash grid, reduced iteration budgets) on CPU and asserts that the
estimated trajectory stays close to ground truth. This is the rebuild's
equivalent of the reference's in-loop ATE self-check
(/root/reference/mipsfusion.py:712-716) expressed as an automated test
(the reference has no test suite, SURVEY.md §4).
"""

import numpy as np
import pytest

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU

pytestmark = pytest.mark.slow


def tiny_config(n_frames=24):
    return {
        "dataset": "synthetic",
        "seed": 0,
        "use_manager": False,
        # the virtual 8-device CPU mesh shares physical cores, so the
        # sharded refine / DP hot paths only slow CPU tests;
        # tests/test_sharded_refine.py and tests/test_sharded_ba.py opt
        # in explicitly
        "parallel": {"sharded_refine": False, "dp_hot_path": False},
        "synthetic": {"trajectory": "orbit", "n_frames": n_frames,
                      "span": n_frames / 200.0,
                      "room_half": [3.0, 2.2, 2.5]},
        "data": {"downsample": 1, "sc_factor": 1.0, "output": None},
        "mapping": {
            "sample": 600, "pixels_cur": 200, "iters": 10,
            "lr_embed": 0.01, "lr_decoder": 0.01,
            "lr_rot": 0.001, "lr_trans": 0.001,
            "keyframe_every": 6, "map_every": 3,
            "localMLP_num": 4, "localMLP_max_len": [3.5, 3.5, 3.5],
            "first_iters": 300, "optim_cur": False,
            "min_pixels_cur": 20, "map_accum_step": 1,
            "pose_accum_step": 3, "map_wait_step": 0,
            "bound": [[-4.0, 4.0], [-3.2, 3.2], [-3.5, 3.5]],
        },
        "tracking": {
            "iter": 10, "iter_RO": 5, "sample": 400,
            "lr_rot": 0.002, "lr_trans": 0.002,
            "ignore_edge_W": 4, "ignore_edge_H": 4,
            "const_speed": True, "best": True, "wait_iters": 100,
            "switch_interval": 30,
            "RO": {"particle_size": 800, "initial_scaling_factor": 0.02,
                   "rescaling_factor": 0.5, "n_rows": 16, "n_cols": 24},
        },
        "sampling": {"kf_n_rays_h": 30, "kf_n_rays_w": 40,
                     "n_rays_h": 8, "n_rays_w": 12},
        "grid": {"enc": "HashGrid", "hash_size": 13,
                 "tcnn_encoding": True, "use_bound_normalize": True},
        "pos": {"enc": "Frequency", "n_bins": 4},
        "training": {
            "rgb_weight": 1.0, "depth_weight": 0.1, "sdf_weight": 1000.0,
            "fs_weight": 10.0, "n_samples_d": 16, "range_d": 0.25,
            "n_range_d": 11, "perturb": 1, "trunc": 0.1,
            "rgb_missing": 0.0, "norm_factor": 1.0,
        },
        "cam": {"H": 60, "W": 80, "fx": 40.0, "fy": 40.0,
                "cx": 39.5, "cy": 29.5, "near": 0.0, "far": 8.0,
                "depth_trunc": 100.0, "png_depth_scale": 1000.0},
    }


@pytest.fixture(scope="module")
def slam_run():
    from fixture_cache import cached_run
    cfg = tiny_config()

    def make_slam():
        ds = SyntheticDataset(cfg, n_frames=cfg["synthetic"]["n_frames"],
                              trajectory="orbit",
                              span=cfg["synthetic"]["span"])
        return MIPSFusionTPU(cfg, dataset=ds)

    slam, aux = cached_run("slam_single", cfg, make_slam,
                           lambda s: {"results": s.run(verbose=False)},
                           extra_files=(__file__,))
    return slam, aux["results"]


def test_trajectory_accuracy(slam_run):
    _, results = slam_run
    # tiny budgets, but the synthetic orbit is easy and tracks at
    # millimeters — 2 cm leaves generous noise headroom while binding
    assert results["absolute_translational_error.rmse"] < 0.02, results


def test_tracking_losses_decrease(slam_run):
    slam, _ = slam_run
    assert np.isfinite(slam.track_losses).all()
    # late-sequence tracking should not be diverging
    assert np.mean(slam.track_losses[-5:]) < 10 * np.mean(
        slam.track_losses[:5]) + 1.0


def test_keyframes_registered(slam_run):
    slam, _ = slam_run
    n_kf = int(slam.state.n_kf)
    assert n_kf == 24 // 6  # frames 0, 6, 12, 18
    ids = np.asarray(slam.state.kf_frame_ids[:n_kf])
    np.testing.assert_array_equal(ids, [0, 6, 12, 18])
    # all bound to submap 0 in the single-submap phase
    binds = np.asarray(slam.state.keyframe_localMLP[:n_kf, 0])
    np.testing.assert_array_equal(binds, 0)


def test_world_trajectory_anchoring(slam_run):
    slam, _ = slam_run
    world = slam.world_trajectory(23)
    # frame 0's world pose must equal the GT anchor exactly
    np.testing.assert_allclose(world[0], np.asarray(slam.dataset[0]["c2w"]),
                               atol=1e-5)
