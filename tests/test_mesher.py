"""Tests for the native marching extraction and the Mesher."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mipsfusion_tpu.mesher.marching import marching_cubes, _marching_py

pytestmark = pytest.mark.slow


def sphere_tsdf(n=32, r=0.3, trunc=0.2):
    ax = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    d = np.sqrt(gx**2 + gy**2 + gz**2) - r
    return np.clip(d, -trunc + 1e-4, trunc - 1e-4).astype(np.float32), ax


def test_marching_sphere_native():
    vol, ax = sphere_tsdf()
    verts, faces = marching_cubes(vol, 0.0, 0.25)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie near the sphere surface
    voxel = ax[1] - ax[0]
    pts = -0.5 + verts * voxel
    r = np.linalg.norm(pts, axis=-1)
    assert np.abs(r - 0.3).max() < 0.03, np.abs(r - 0.3).max()
    # faces index valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0


def test_marching_truncation_rejection():
    vol, _ = sphere_tsdf(trunc=0.2)
    # poison a corner region with +/-truncation values: cubes there must
    # be skipped without crashing
    vol2 = vol.copy()
    vol2[:8, :8, :8] = 0.25
    verts1, _ = marching_cubes(vol, 0.0, 0.2)
    verts2, faces2 = marching_cubes(vol2, 0.0, 0.2)
    assert len(verts2) > 0
    # and non-finite values likewise
    vol3 = vol.copy()
    vol3[:4] = np.nan
    verts3, _ = marching_cubes(vol3, 0.0, 0.25)
    assert np.isfinite(verts3).all()


def test_native_matches_python_fallback():
    vol, _ = sphere_tsdf(n=12)
    vn, fn = marching_cubes(vol, 0.0, 0.25)
    vp, fp = _marching_py(vol, 0.0, 0.25)
    assert len(vn) == len(vp)
    assert len(fn) == len(fp)
    # same welded vertex sets (order may differ)
    sn = set(map(tuple, np.round(vn, 4)))
    sp = set(map(tuple, np.round(vp, 4)))
    assert sn == sp


def test_mesher_on_trained_field():
    """Train a tiny field on an analytic sphere SDF and mesh it."""
    from mipsfusion_tpu.models import scene_rep as sr
    from mipsfusion_tpu.models.decoder import DecoderConfig
    from mipsfusion_tpu.ops.encoding import TriplaneConfig, FrequencyConfig
    from mipsfusion_tpu.mesher import Mesher, MeshConfig
    import optax

    tri = TriplaneConfig(resolutions=(16, 32), n_features=2)
    freq = FrequencyConfig(n_frequencies=2)
    fcfg = sr.FieldConfig(
        enc="Triplane", tri=tri, freq=freq,
        decoder=DecoderConfig(input_ch=tri.out_dim,
                              input_ch_pos=freq.out_dim + 3),
        trunc=0.3)
    consts = sr.FieldConsts.from_bound(
        jnp.asarray([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]]))
    params = sr.init_field_params(jax.random.PRNGKey(0), fcfg)

    # supervise query_sdf directly against a sphere SDF (radius 0.5)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        # half uniform, half in a radial shell around the surface so the
        # sphere interior (negative SDF) is well represented
        pts_u = jax.random.uniform(k1, (512, 3), minval=-0.9, maxval=0.9)
        dirs = jax.random.normal(k2, (512, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        radii = jax.random.uniform(k3, (512, 1), minval=0.1, maxval=0.9)
        pts = jnp.concatenate([pts_u, dirs * radii], axis=0)
        target = jnp.linalg.norm(pts, axis=-1) - 0.5

        def loss_fn(p):
            sdf = sr.query_sdf(p, pts, fcfg, consts)[:, 0] * fcfg.trunc
            return jnp.mean((sdf - jnp.clip(target, -0.29, 0.29)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(g, state, params)
        return optax.apply_updates(params, upd), state, loss

    key = jax.random.PRNGKey(1)
    for i in range(400):
        key, k = jax.random.split(key)
        params, state, loss = step(params, state, k)
    assert float(loss) < 5e-3, float(loss)

    mesher = Mesher(fcfg, consts, MeshConfig(voxel_size=0.08))
    # field SDF is in units of trunc: extractor sees sdf in [-1, 1]
    verts, faces, colors = mesher.extract_single_mesh(
        np.eye(4), np.zeros(3), np.array([1.8, 1.8, 1.8]),
        trunc=0.95, params=params) if False else \
        mesher.extract_single_mesh(params, np.eye(4), np.zeros(3),
                                   np.array([1.8, 1.8, 1.8]), trunc=0.95)
    assert len(verts) > 50
    r = np.linalg.norm(verts, axis=-1)
    # mesh approximates the 0.5-radius sphere
    assert abs(np.median(r) - 0.5) < 0.08, np.median(r)


def test_recon_metrics_on_synthetic_run():
    """End-to-end: short SLAM run -> joint mesh -> accuracy/completion
    against the analytic GT SDF."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_slam_single import tiny_config
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU
    from mipsfusion_tpu.eval.recon import evaluate_synthetic_mesh

    cfg = tiny_config(14)
    cfg["mapping"]["first_iters"] = 250
    cfg["mesh"] = {"voxel_final": 0.08, "extract_final": False}
    ds = SyntheticDataset(cfg, n_frames=14, trajectory="orbit",
                          span=14 / 200.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    slam.run(verbose=False)
    metrics = evaluate_synthetic_mesh(slam, n_gt_samples=4000)
    assert metrics["n_vertices"] > 500
    # tiny budgets: demand the mesh hugs the true surface within ~6 cm
    assert metrics["mesh_accuracy_m"] < 0.06, metrics
    # the camera sees only part of the room in 14 frames; completion is
    # partial but must be nonzero
    assert metrics["mesh_completion@5cm"] > 0.05, metrics


def test_ply_roundtrip_and_concat(tmp_path):
    """save_mesh_ply <-> load_mesh_ply round trip + clip concatenation
    (vis/mesh_concat.py's core, ref vis/mesh_concat.py)."""
    from mipsfusion_tpu.mesher.mesher import (concat_meshes, load_mesh_ply,
                                              save_mesh_ply)

    rng = np.random.default_rng(0)
    v1 = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    f1 = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    c1 = rng.uniform(0, 1, (10, 3)).astype(np.float32)
    v2 = rng.uniform(2, 3, (6, 3)).astype(np.float32)
    f2 = np.asarray([[0, 2, 4]], np.int32)

    p1, p2 = str(tmp_path / "clip_0.ply"), str(tmp_path / "clip_1.ply")
    save_mesh_ply(p1, v1, f1, c1)
    save_mesh_ply(p2, v2, f2, None)

    rv1, rf1, rc1 = load_mesh_ply(p1)
    assert np.allclose(rv1, v1, atol=1e-4)
    assert np.array_equal(rf1, f1)
    assert rc1 is not None and np.allclose(rc1, c1, atol=1 / 255.0)
    rv2, rf2, rc2 = load_mesh_ply(p2)
    assert rc2 is None and np.array_equal(rf2, f2)

    verts, faces, colors = concat_meshes([(rv1, rf1, rc1), (rv2, rf2, rc2)])
    assert len(verts) == 16 and len(faces) == 3
    # second clip's faces are offset by the first clip's vertex count
    assert np.array_equal(faces[2], f2[0] + 10)
    assert colors is not None and len(colors) == 16
