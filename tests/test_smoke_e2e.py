"""Fast end-to-end smoke: one full run() in the DEFAULT test selection.

VERDICT r2 item 6: `pytest -q` must exercise at least one complete SLAM
run (tracking + BA + keyframes + manager predicates + evaluation), not
only units. Budgets are cut to keep the COLD-compile cost small (the
big scan bodies dominate CPU compile time); accuracy is asserted only
loosely — the tight checks live in the slow suite.
"""

import numpy as np

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU

from test_slam_single import tiny_config


def smoke_config(n=12):
    cfg = tiny_config(n)
    cfg["use_manager"] = True           # exercise the predicate pipeline
    cfg["cam"].update({"H": 40, "W": 56, "fx": 28.0, "fy": 28.0,
                       "cx": 27.5, "cy": 19.5})
    cfg["tracking"].update({"iter": 3, "iter_RO": 2, "sample": 96})
    cfg["tracking"]["RO"].update({"particle_size": 128, "n_rows": 8,
                                  "n_cols": 12})
    cfg["mapping"].update({"sample": 128, "pixels_cur": 64, "iters": 3,
                           "first_iters": 60, "keyframe_every": 4,
                           "map_every": 2})
    cfg["sampling"].update({"kf_n_rays_h": 20, "kf_n_rays_w": 28})
    cfg["training"].update({"n_samples_d": 8, "n_range_d": 7})
    return cfg


def test_full_run_smoke(tmp_path):
    n = 12
    cfg = smoke_config(n)
    # in-loop meshing on the mesh_freq cadence (ref InactiveMap.py:526-529
    # mesh_flag): one mid-run extraction at frame 8, coarse voxel so the
    # marching pass stays cheap on CPU
    cfg["data"]["output"] = str(tmp_path)
    cfg["mesh"] = {"voxel_final": 0.12, "mesh_freq": 8, "vis": 0,
                   "ckpt_freq": 0, "extract_final": False}
    ds = SyntheticDataset(cfg, n_frames=n, trajectory="orbit",
                          span=n / 400.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    results = slam.run(verbose=False)

    mid_meshes = list(tmp_path.glob("**/mesh_8.ply"))
    assert mid_meshes and mid_meshes[0].stat().st_size > 0, \
        "mesh_freq did not produce a mid-run mesh"

    assert np.isfinite(results["absolute_translational_error.rmse"])
    # budgets are tiny and the motion is small: demand only that
    # tracking did not diverge (the slow suite asserts millimeters)
    assert results["absolute_translational_error.rmse"] < 0.10, results
    assert results["n_submaps"] == 1
    assert len(slam.track_losses) == n - 1
    assert np.isfinite(np.asarray(slam.track_losses)).all()
    # trajectory assembly covers keyframe + relative-pose slots
    world = slam.world_trajectory(n - 1)
    assert world.shape == (n, 4, 4)
    assert np.isfinite(world).all()
