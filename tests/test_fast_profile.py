"""Fast-profile validation on a MULTI-SUBMAP trajectory (VERDICT r2
item 4): the reduced budgets that give the headline FPS must hold ATE
through submap switches, not only on the easy single-submap orbit.

The corridor scene (tests/test_sharded_refine.py recipe) spawns several
submaps in 45 frames; the fast leg cuts the same budget ratios as
configs/synthetic/orbit_fast.yaml (RO iters/particles, GO iters/rays,
BA iters/rays, z-samples).
"""

import jax
import numpy as np
import pytest

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU
from test_sharded_refine import corridor_cfg

pytestmark = pytest.mark.slow


def _run(cfg, tag):
    from fixture_cache import cached_run
    cfg["mapping"]["first_iters"] = 150

    def make_slam():
        ds = SyntheticDataset(cfg, n_frames=cfg["synthetic"]["n_frames"],
                              trajectory="corridor", span=1.0)
        return MIPSFusionTPU(cfg, dataset=ds)

    slam, aux = cached_run(tag, cfg, make_slam,
                           lambda s: {"results": s.run(verbose=False)},
                           extra_files=(__file__,))
    return slam, aux["results"]


def test_fast_profile_holds_ate_across_submaps():
    full_cfg = corridor_cfg(sharded=False)
    slam_f, res_f = _run(full_cfg, "fast_profile_full")
    assert res_f["n_submaps"] >= 2, "corridor must spawn several submaps"

    fast_cfg = corridor_cfg(sharded=False)
    # orbit_fast.yaml's budget ratios applied to the tiny test budgets
    fast_cfg["tracking"].update({"iter": 8, "iter_RO": 4, "sample": 256})
    fast_cfg["tracking"]["RO"].update({"particle_size": 512,
                                       "n_rows": 12, "n_cols": 16})
    fast_cfg["mapping"].update({"sample": 384, "pixels_cur": 128,
                                "iters": 7})
    fast_cfg["training"].update({"n_samples_d": 10, "n_range_d": 7})
    slam_q, res_q = _run(fast_cfg, "fast_profile_fast")
    assert res_q["n_submaps"] >= 2, "fast profile lost the submap structure"

    ate_full = res_f["absolute_translational_error.rmse"]
    ate_fast = res_q["absolute_translational_error.rmse"]
    print(f"corridor ATE full {ate_full*1000:.1f} mm, "
          f"fast {ate_fast*1000:.1f} mm")
    # neither leg may diverge, and the fast profile must stay within
    # 20% (+2 mm noise floor) of the full-budget ATE
    assert ate_full < 0.2, f"full-budget corridor diverged: {ate_full}"
    assert ate_fast < 0.2, f"fast-profile corridor diverged: {ate_fast}"
    assert ate_fast <= ate_full * 1.2 + 0.002, (ate_fast, ate_full)
