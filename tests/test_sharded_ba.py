"""Ray-DP on the live hot path (local BA + submap init), virtual 8-CPU mesh.

VERDICT r2 item 1: the mapping hot loop (ref mipsfusion.py:259-370) must
run data-parallel over rays on a multi-chip mesh IN THE LIVE SYSTEM —
params replicated, the per-iteration ray batch sharded over the data
axis, gradient all-reduce riding ICI. This test drives the full system
both ways and demands ATE parity.
"""

import jax
import numpy as np
import pytest

from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU
from test_slam_single import tiny_config

pytestmark = pytest.mark.slow


def _run(dp: bool, n=24):
    from fixture_cache import cached_run
    cfg = tiny_config(n)
    cfg["parallel"] = {"sharded_refine": False, "dp_hot_path": dp}

    def make_slam():
        ds = SyntheticDataset(cfg, n_frames=n, trajectory="orbit",
                              span=n / 200.0)
        return MIPSFusionTPU(cfg, dataset=ds)

    slam, aux = cached_run(f"sharded_ba_{int(dp)}", cfg, make_slam,
                           lambda s: {"results": s.run(verbose=False)},
                           extra_files=(__file__,))
    return slam, aux["results"]


def test_dp_hot_path_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    slam_dp, res_dp = _run(dp=True)
    assert slam_dp.use_dp_hot and slam_dp._ray_sharding is not None
    # the sharded batch is padded to a multiple of the mesh size
    assert slam_dp._round_rays(601) % slam_dp.n_devices == 0

    slam_sq, res_sq = _run(dp=False)
    assert slam_sq._ray_sharding is None

    ate_dp = res_dp["absolute_translational_error.rmse"]
    ate_sq = res_sq["absolute_translational_error.rmse"]
    print(f"ATE dp {ate_dp*1000:.1f} mm, single {ate_sq*1000:.1f} mm")
    # both legs must track the easy orbit tightly, and the DP path must
    # not change the result beyond reduction-order noise + the padded
    # ray count (measured: sub-mm difference)
    assert ate_dp < 0.02, f"DP-path ATE diverged: {ate_dp}"
    assert ate_sq < 0.02, f"single-path ATE diverged: {ate_sq}"
    assert abs(ate_dp - ate_sq) < 0.005

    # field params stay finite under the sharded updates
    leaves = jax.tree.leaves(slam_dp.submap_params[slam_dp.active_id])
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)
