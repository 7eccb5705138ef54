"""Fast-camera-motion stress test: RO must rescue GO (VERDICT r4 item 6).

Fast camera motion is MIPSFusion's headline claim ("FastCaMo" = FAST
CAmera MOtion); the gradient-free random optimizer exists precisely to
recover poses the gradient tracker cannot reach when the motion model's
prediction lands outside GO's convergence basin
(/root/reference/RandomOptimizer.py:10-227, paper §ROSEFusion lineage).

The "sweep" trajectory (datasets/synthetic.py) combines a fast yaw
sweep with a high-frequency jerk term that defeats the constant-
velocity prediction (~6 deg/frame peak rate, ~2 deg/frame^2
acceleration at this length). The ablation asserts the division of
labor: with RO the run tracks; with iter_RO=0 (GO alone from the
motion-model seed) the trajectory error grows by a large factor.
"""

import numpy as np
import pytest

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU
from test_slam_single import tiny_config

pytestmark = pytest.mark.slow

N_FRAMES = 60


def sweep_cfg(iter_ro: int):
    cfg = tiny_config(N_FRAMES)
    cfg["synthetic"] = {"trajectory": "sweep", "n_frames": N_FRAMES,
                        "span": 1.0, "room_half": [3.0, 2.2, 2.5]}
    # full-ratio tracking budgets at the test image scale (60x80):
    # the reference's 5 RO iters and 10 GO iters, NOT the fast profile
    cfg["tracking"].update({"iter": 10, "iter_RO": iter_ro, "sample": 400})
    cfg["tracking"]["RO"].update({"particle_size": 800,
                                  "n_rows": 16, "n_cols": 24})
    return cfg


def _run(iter_ro: int):
    from fixture_cache import cached_run
    cfg = sweep_cfg(iter_ro)

    def make_slam():
        ds = SyntheticDataset(cfg, n_frames=N_FRAMES, trajectory="sweep",
                              span=1.0)
        return MIPSFusionTPU(cfg, dataset=ds)

    slam, aux = cached_run(f"fast_motion_ro{iter_ro}", cfg, make_slam,
                           lambda s: {"results": s.run(verbose=False)},
                           extra_files=(__file__,))
    return aux["results"]


def test_ro_rescues_fast_motion():
    res_ro = _run(iter_ro=5)
    res_go = _run(iter_ro=0)
    ate_ro = res_ro["absolute_translational_error.rmse"]
    ate_go = res_go["absolute_translational_error.rmse"]
    print(f"sweep ATE with RO {ate_ro*1000:.1f} mm, "
          f"GO-only {ate_go*1000:.1f} mm")
    # with RO the fast sweep must track
    assert ate_ro < 0.05, f"RO-assisted sweep diverged: {ate_ro}"
    # without RO the same budgets must do substantially worse — this is
    # the reason the RO stage exists
    assert ate_go > 2.0 * ate_ro, (
        f"GO alone matched RO ({ate_go} vs {ate_ro}) — the sweep scene "
        "no longer stresses the motion model; raise its jerk term")
