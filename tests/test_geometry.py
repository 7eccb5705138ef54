import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipsfusion_tpu.ops import geometry as geo


def random_rotation(rng):
    # random quaternion -> rotation
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(geo.quaternion_to_matrix(jnp.asarray(q, jnp.float32)))


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = geo.quaternion_to_matrix(jnp.asarray(q, jnp.float32))
        q2 = geo.matrix_to_quaternion(R)
        np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_rotation_orthonormal():
    rng = np.random.default_rng(1)
    R = random_rotation(rng)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_pose_inverse():
    rng = np.random.default_rng(2)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = random_rotation(rng)
    T[:3, 3] = rng.normal(size=3)
    Tinv = geo.pose_inverse(jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(Tinv) @ T, np.eye(4), atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    xi = rng.normal(size=(5, 6)).astype(np.float32) * 0.5
    T = geo.se3_exp(jnp.asarray(xi))
    xi2 = geo.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)
    # small twists too (numerical-stability branch)
    xi_small = rng.normal(size=(5, 6)).astype(np.float32) * 1e-7
    T = geo.se3_exp(jnp.asarray(xi_small))
    np.testing.assert_allclose(np.asarray(geo.se3_log(T)), xi_small, atol=1e-9)


def test_camera_rays_opengl():
    H, W, fx, fy, cx, cy = 8, 10, 5.0, 5.0, 4.5, 3.5
    dirs = geo.get_camera_rays(H, W, fx, fy, cx, cy)
    assert dirs.shape == (H, W, 3)
    # center pixel looks along -z
    np.testing.assert_allclose(np.asarray(dirs[3, 4]),
                               [(4 - cx) / fx, -(3 - cy) / fy, -1.0], atol=1e-6)
    # all z components are -1
    np.testing.assert_allclose(np.asarray(dirs[..., 2]), -1.0)


def test_rays_to_world_consistency():
    rng = np.random.default_rng(4)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = random_rotation(rng)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    d_cam = rng.normal(size=(7, 3)).astype(np.float32)
    o, d = geo.rays_to_world(jnp.asarray(d_cam), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(o), np.tile(c2w[:3, 3], (7, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_cam @ c2w[:3, :3].T, atol=1e-5)

    # batched version with per-ray poses agrees
    poses = np.stack([c2w] * 3)
    idx = np.array([0, 1, 2, 0, 1, 2, 0])
    o2, d2 = geo.rays_to_world_batched(jnp.asarray(d_cam), jnp.asarray(poses),
                                       jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-5)


def test_frame_surface_bbox():
    # camera at origin looking down -z, flat wall at z=-2
    H, W = 16, 16
    dirs = geo.get_camera_rays(H, W, 8.0, 8.0, 7.5, 7.5)
    depth = jnp.full((H, W), 2.0)
    c2w = jnp.eye(4)
    center, length = geo.get_frame_surface_bbox(c2w, depth, dirs, 0.0, 5.0)
    center, length = np.asarray(center), np.asarray(length)
    assert center[2] == pytest.approx(-2.0, abs=1e-5)
    assert length[2] == pytest.approx(0.0, abs=1e-5)
    assert length[0] > 0 and length[1] > 0


def test_pts_in_bbox():
    pts = jnp.asarray([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5]])
    lo = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    hi = jnp.asarray([[1.0, 1.0, 1.0], [3.0, 1.0, 1.0]])
    m = np.asarray(geo.pts_in_bbox(pts, lo, hi))
    assert m.tolist() == [[True, False], [False, True]]


def test_project_to_pixel_roundtrip():
    H, W, fx, fy, cx, cy = 48, 64, 32.0, 32.0, 31.5, 23.5
    K = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    dirs = geo.get_camera_rays(H, W, fx, fy, cx, cy)
    # back-project some pixels and re-project
    px = [(5, 7), (20, 33), (47, 0)]
    pts = jnp.stack([dirs[r, c] * 2.0 for r, c in px])
    uv = np.asarray(geo.project_to_pixel(K, pts))
    for (r, c), (u, v) in zip(px, uv):
        assert u == pytest.approx(c, abs=1e-3)
        assert v == pytest.approx(r, abs=1e-3)
