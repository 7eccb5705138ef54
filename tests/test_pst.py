"""The RO particle swarm template must be exactly mean-free.

The reference pre-samples the PST once and reuses it for every
iteration of every frame (ref RandomOptimizer.py:26-32); a raw draw
leaves a ~1/sqrt(P) sample-mean bias per axis that pushes the weighted
APS update in one fixed direction for the whole sequence (observed as
template-seed-dependent drift/divergence on the outback scene). The
antithetic construction removes it by design.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mipsfusion_tpu.slam.tracker import ROConfig, make_pst


def test_pst_zero_mean_and_identity_particle():
    for p in (1024, 2000, 999):
        cfg = ROConfig(particle_size=p)
        pst = make_pst(jax.random.PRNGKey(3), cfg)
        assert pst.shape == (p, 6)
        # particle 0 is the identity candidate (ref :31)
        np.testing.assert_array_equal(np.asarray(pst[0]), np.zeros(6))
        # exactly mean-free (antithetic pairs + inert identity rows)
        np.testing.assert_allclose(np.asarray(pst.sum(0)), np.zeros(6),
                                   atol=1e-4)
        # clamp preserved
        assert float(jnp.abs(pst).max()) <= 2.0
        # still a real spread (not degenerate)
        assert float(pst.std()) > 0.5


def _ro_setup(screen_px=0, screen_keep=0, P=64):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_field import small_field_cfg
    from mipsfusion_tpu.models import scene_rep as sr
    from mipsfusion_tpu.slam import tracker

    fcfg = small_field_cfg()
    consts = sr.FieldConsts.from_norm_factor(jnp.asarray([3.0, 3.0, 3.0]))
    params = sr.init_field_params(jax.random.PRNGKey(0), fcfg)
    rcfg = ROConfig(particle_size=P, n_rows=6, n_cols=8, n_iters=3,
                    screen_px=screen_px, screen_keep=screen_keep)
    H, W = 24, 32
    depth = jnp.full((H, W), 2.0)
    ii, jj = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    dirs = jnp.stack([(jj - 16.0) / 20.0, (ii - 12.0) / 20.0,
                      -jnp.ones_like(ii, jnp.float32)], -1)
    row, col = tracker.ro_pixel_grid(H, W, rcfg)
    return fcfg, consts, params, rcfg, depth, dirs, row, col


def test_ro_screen_finite_and_rigid():
    """Two-stage screen: result must stay a finite rigid transform (the
    non-survivor sentinel is finite, so no NaN enters the APS weights)."""
    from mipsfusion_tpu.slam import tracker
    fcfg, consts, params, rcfg, depth, dirs, row, col = _ro_setup(
        screen_px=16, screen_keep=24)
    pst = make_pst(jax.random.PRNGKey(1), rcfg)
    pose0 = jnp.eye(4).at[0, 3].set(0.05)
    T = tracker.ro_optimize(params, fcfg, consts, rcfg, pst, depth, dirs,
                            pose0, row, col, rcfg.n_iters)
    T = np.asarray(T)
    assert np.isfinite(T).all()
    np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3),
                               atol=1e-4)


def test_ro_screen_identity_anchor():
    """With a degenerate all-identity swarm no particle beats particle 0
    (fit == f0, and screened-out sentinels are > f0), so the pose must
    come back EXACTLY unchanged — same as the exact path's no-success
    branch."""
    from mipsfusion_tpu.slam import tracker
    fcfg, consts, params, rcfg, depth, dirs, row, col = _ro_setup(
        screen_px=16, screen_keep=24)
    pst = jnp.zeros((rcfg.particle_size, 6))
    pose0 = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.02, -0.01, 0.03]))
    T = tracker.ro_optimize(params, fcfg, consts, rcfg, pst, depth, dirs,
                            pose0, row, col, rcfg.n_iters)
    np.testing.assert_allclose(np.asarray(T), np.asarray(pose0), atol=1e-6)


def test_ro_escalation_inactive_until_seeded():
    """tracking.RO.escalate must be a no-op while the loss EWMA is
    unseeded (fresh regime after init/switch) and when prev strain is
    at/below the EWMA — the reference fixed-reach behavior — and must
    grow the initial search size by clip(prev/EWMA, 1, cap) once
    strained (tracker.track_frame; diag: tools/diag_sweep.py)."""
    import dataclasses
    from mipsfusion_tpu.slam import tracker
    fcfg, consts, params, rcfg, depth, dirs, row, col = _ro_setup()
    rgb = jnp.zeros(depth.shape + (3,))
    est = jnp.broadcast_to(jnp.eye(4), (8, 4, 4))
    gcfg = tracker.GOConfig(n_iters=0, n_rays=64)
    pst = make_pst(jax.random.PRNGKey(1), rcfg)

    from mipsfusion_tpu.models import scene_rep as sr
    lw = sr.LossWeights()

    def run(esc, prev, ewma):
        rc = dataclasses.replace(rcfg, escalate=esc)
        res = tracker.track_frame(
            params, fcfg, consts, rc, gcfg, pst, jax.random.PRNGKey(0),
            rgb, depth, dirs, est, jnp.asarray(3), jnp.asarray(False),
            lw, rcfg.n_iters, 0,
            loss_ewma=jnp.asarray(ewma, jnp.float32),
            prev_loss=jnp.asarray(prev, jnp.float32))
        return np.asarray(res.pose)

    base = run(0.0, -1.0, -1.0)
    # unseeded EWMA: escalation must not change the pose
    np.testing.assert_allclose(run(4.0, -1.0, -1.0), base, atol=0)
    # seeded but unstrained (prev == ewma): still identical
    np.testing.assert_allclose(run(4.0, 0.01, 0.01), base, atol=0)
    # strained: the search reach changes, so the pose must differ
    strained = run(4.0, 0.08, 0.01)
    assert np.abs(strained - base).max() > 0
