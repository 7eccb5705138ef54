"""Ray/particle-DP on the TRACKING hot loops (VERDICT r3 item 7).

The per-frame hot loops — RO particle fitness over [3, P*n] points
(ref RandomOptimizer.py:113-131) and the GO render batch
(ref mipsfusion.py:490-556) — must be data-parallel over the mesh's
data axis with field params replicated, like local BA already is
(tests/test_sharded_ba.py). Structural HLO assertions + numeric parity
on the virtual 8-CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mipsfusion_tpu.models import scene_rep as sr
from mipsfusion_tpu.slam import tracker
from test_slam_single import tiny_config


def _setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config(8)
    fcfg = sr.FieldConfig.from_dict(cfg)
    consts = sr.FieldConsts.from_bound(
        jnp.asarray(cfg["mapping"]["bound"], jnp.float32))
    lw = sr.LossWeights.from_dict(cfg)
    rcfg = tracker.ROConfig.from_dict(cfg)
    gcfg = tracker.GOConfig.from_dict(cfg)
    key = jax.random.PRNGKey(0)
    params = sr.init_field_params(key, fcfg)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    return cfg, fcfg, consts, lw, rcfg, gcfg, key, params, sh


def _frame(cfg, key):
    H, W = cfg["cam"]["H"], cfg["cam"]["W"]
    from mipsfusion_tpu.ops.geometry import get_camera_rays
    rays_d = get_camera_rays(H, W, cfg["cam"]["fx"], cfg["cam"]["fy"],
                             cfg["cam"]["cx"], cfg["cam"]["cy"])
    depth = 2.0 + 0.5 * jax.random.uniform(key, (H, W))
    rgb = jax.random.uniform(key, (H, W, 3))
    return rays_d, depth, rgb


def test_dp_tracking_lowering_is_sharded():
    """With the constraint, the compiled track_frame must carry sharded
    ops (all-reduce for the RO fitness means / GO pose grads); without
    it, none."""
    cfg, fcfg, consts, lw, rcfg, gcfg, key, params, sh = _setup()
    rays_d, depth, rgb = _frame(cfg, key)
    est = jnp.broadcast_to(jnp.eye(4), (8, 4, 4))

    def lower(ray_sharding):
        return tracker.track_frame.lower(
            params, fcfg, consts, rcfg, gcfg,
            tracker.make_pst(key, rcfg), key, rgb, depth, rays_d, est,
            jnp.int32(1), jnp.asarray(True), lw, 2, 2,
            ray_sharding=ray_sharding).compile().as_text()

    hlo_dp = lower(sh)
    hlo_rep = lower(None)
    assert "all-reduce" in hlo_dp, \
        "DP tracking lowering lost the sharding constraint"
    assert "all-reduce" not in hlo_rep


def test_dp_tracking_matches_single_device():
    """The sharded tracker must return (numerically) the same pose."""
    cfg, fcfg, consts, lw, rcfg, gcfg, key, params, sh = _setup()
    rays_d, depth, rgb = _frame(cfg, key)
    est = jnp.broadcast_to(jnp.eye(4), (8, 4, 4))
    # non-trivial previous pose for the motion model
    prev = jnp.eye(4).at[0, 3].set(0.01)
    est = est.at[0].set(prev)
    pst = tracker.make_pst(key, rcfg)

    res_dp = tracker.track_frame(
        params, fcfg, consts, rcfg, gcfg, pst, key, rgb, depth, rays_d,
        est, jnp.int32(1), jnp.asarray(False), lw, 3, 3, ray_sharding=sh)
    res_1 = tracker.track_frame(
        params, fcfg, consts, rcfg, gcfg, pst, key, rgb, depth, rays_d,
        est, jnp.int32(1), jnp.asarray(False), lw, 3, 3, ray_sharding=None)
    # identical math modulo reduction order: the poses must agree far
    # below tracking noise
    np.testing.assert_allclose(np.asarray(res_dp.pose),
                               np.asarray(res_1.pose), atol=1e-4)
    np.testing.assert_allclose(float(res_dp.loss), float(res_1.loss),
                               rtol=1e-3)


@pytest.mark.slow
def test_dp_tracking_live_system_parity():
    """Drive the live system with dp_hot_path on (now covering
    tracking, BA and init) vs off, and demand ATE parity."""
    from fixture_cache import cached_run
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    results = {}
    for dp in (True, False):
        cfg = tiny_config(24)
        cfg["parallel"] = {"sharded_refine": False, "dp_hot_path": dp}

        def make_slam(cfg=cfg):
            ds = SyntheticDataset(cfg, n_frames=24, trajectory="orbit",
                                  span=24 / 200.0)
            return MIPSFusionTPU(cfg, dataset=ds)

        _, aux = cached_run(f"sharded_track_{int(dp)}", cfg, make_slam,
                            lambda s: {"results": s.run(verbose=False)},
                            extra_files=(__file__,))
        results[dp] = aux["results"]["absolute_translational_error.rmse"]
    print(f"ATE dp {results[True]*1000:.2f} mm, "
          f"single {results[False]*1000:.2f} mm")
    assert results[True] < 0.03 and results[False] < 0.03, results
    assert abs(results[True] - results[False]) < 0.01, results
