"""Unit tests for ICP rectification and pose-graph optimization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mipsfusion_tpu.ops.geometry import se3_exp, se3_log, pose_inverse, _mm
from mipsfusion_tpu.slam import icp, pose_graph


def make_cloud(rng, n=800):
    """Structured cloud: three non-parallel planes + a bump (well-
    constrained for point-to-plane)."""
    k = n // 4
    a = np.stack([rng.uniform(-1, 1, k), rng.uniform(-1, 1, k),
                  np.zeros(k)], -1)
    b = np.stack([rng.uniform(-1, 1, k), np.zeros(k),
                  rng.uniform(-1, 1, k)], -1)
    c = np.stack([np.zeros(k), rng.uniform(-1, 1, k),
                  rng.uniform(-1, 1, k)], -1)
    th = rng.uniform(0, 2 * np.pi, n - 3 * k)
    ph = rng.uniform(0, np.pi, n - 3 * k)
    s = 0.4 * np.stack([np.sin(ph) * np.cos(th), np.sin(ph) * np.sin(th),
                        np.cos(ph)], -1) + np.array([0.5, 0.5, 0.5])
    return np.concatenate([a, b, c, s]).astype(np.float32)


def test_icp_recovers_small_transform():
    rng = np.random.default_rng(0)
    dst = make_cloud(rng)
    xi_true = np.array([0.03, -0.02, 0.04, 0.02, -0.03, 0.01], np.float32)
    T_true = np.asarray(se3_exp(jnp.asarray(xi_true)))
    # src = T_true^-1 applied, so ICP should recover T_true
    src = (dst - T_true[:3, 3]) @ T_true[:3, :3]

    normals = icp.estimate_normals(jnp.asarray(dst), k=8)
    res = icp.icp_point_to_plane(
        jnp.asarray(src), jnp.ones(len(src), bool),
        jnp.asarray(dst), jnp.ones(len(dst), bool),
        normals, threshold=0.1, n_iters=15)
    T = np.asarray(res.transform)
    err = np.asarray(se3_log(jnp.asarray(
        np.linalg.inv(T_true) @ T, dtype=np.float32)))
    assert np.abs(err).max() < 5e-3, (err, T, T_true)
    assert int(res.n_inliers) > 700


def test_icp_masks_invalid_points():
    rng = np.random.default_rng(1)
    dst = make_cloud(rng, 400)
    src = dst.copy()
    src_valid = np.ones(len(src), bool)
    src_valid[::3] = False
    src[~src_valid] += 100.0  # garbage that must be ignored
    normals = icp.estimate_normals(jnp.asarray(dst), k=8)
    res = icp.icp_point_to_plane(
        jnp.asarray(src), jnp.asarray(src_valid),
        jnp.asarray(dst), jnp.ones(len(dst), bool),
        normals, threshold=0.1, n_iters=8)
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T, np.eye(4), atol=1e-3)


def test_pose_graph_corrects_drift():
    """Chain of 4 submaps with drift; loop edge ties node 3 back to 0."""
    rng = np.random.default_rng(2)
    # ground-truth anchors along a line
    gt = []
    for i in range(4):
        xi = np.zeros(6, np.float32)
        xi[0] = i * 1.0
        xi[4] = 0.2 * i
        gt.append(np.asarray(se3_exp(jnp.asarray(xi))))
    gt = np.stack(gt)

    # drifted estimates: node 3 off by a known error
    drift = np.asarray(se3_exp(jnp.asarray(
        np.array([0.15, -0.1, 0.05, 0.03, -0.02, 0.04], np.float32))))
    est = gt.copy()
    est[3] = drift @ gt[3]

    adjacency = np.zeros((4, 4))
    for i in range(3):
        adjacency[i, i + 1] = adjacency[i + 1, i] = 1

    # key edge 3 -> 0 with the TRUE relative observation:
    # residual log(Z n3^-1 n0) = 0 at ground truth => Z = gt0^-1 gt3... no:
    # r = log(Z @ inv(n_i) @ n_j), i=3, j=0 => Z = inv(gt0) @ gt3
    key_rel = jnp.asarray(np.linalg.inv(gt[0]) @ gt[3], jnp.float32)

    edges, rels, weights = pose_graph.build_pose_graph_problem(
        jnp.asarray(est), adjacency, (3, 0), key_rel,
        key_edge_weight=1.0, n_used=4)
    mask = jnp.asarray([False, True, True, True])
    nodes, cost = pose_graph.optimize_pose_graph(
        jnp.asarray(est), edges, rels, weights, mask, n_iters=15)
    nodes = np.asarray(nodes)

    # node 0 frozen
    np.testing.assert_allclose(nodes[0], est[0], atol=1e-6)
    # node 3's error must shrink substantially (the chain edges pull the
    # correction across all free nodes, as in the reference's PGO)
    err_before = np.abs(np.asarray(se3_log(jnp.asarray(
        np.linalg.inv(gt[3]) @ est[3], dtype=np.float32))))
    err_after = np.abs(np.asarray(se3_log(jnp.asarray(
        (np.linalg.inv(gt[3]) @ nodes[3]).astype(np.float32)))))
    assert err_after.max() < 0.6 * err_before.max(), (err_before, err_after)
    assert float(cost) < 1e-2


def test_pose_graph_zero_residual_stays_put():
    gt = np.stack([np.asarray(se3_exp(jnp.asarray(
        np.array([i, 0, 0, 0, 0, 0], np.float32)))) for i in range(3)])
    adjacency = np.ones((3, 3)) - np.eye(3)
    key_rel = jnp.asarray(np.linalg.inv(gt[0]) @ gt[2], jnp.float32)
    edges, rels, weights = pose_graph.build_pose_graph_problem(
        jnp.asarray(gt), adjacency, (2, 0), key_rel, 0.1, n_used=3)
    mask = jnp.asarray([False, True, True])
    nodes, cost = pose_graph.optimize_pose_graph(
        jnp.asarray(gt), edges, rels, weights, mask, n_iters=5)
    np.testing.assert_allclose(np.asarray(nodes), gt, atol=1e-5)
    assert float(cost) < 1e-10


def test_svd_icp_recovers_transform():
    """Smoke test mirroring the reference's only executable test
    (/root/reference/external/Pypose_external/ICP.py:112-124)."""
    from mipsfusion_tpu.ops.geometry import se3_exp
    rng = np.random.default_rng(5)
    dst = make_cloud(rng, 400)
    xi = np.array([0.05, -0.04, 0.03, 0.04, -0.02, 0.05], np.float32)
    T_true = np.asarray(se3_exp(jnp.asarray(xi)))
    src = (dst - T_true[:3, 3]) @ T_true[:3, :3]
    res = icp.icp_point_to_point(
        jnp.asarray(src), jnp.ones(len(src), bool),
        jnp.asarray(dst), jnp.ones(len(dst), bool),
        threshold=0.2, n_iters=20)
    T = np.asarray(res.transform)
    err = np.abs(np.asarray(se3_log(jnp.asarray(
        (np.linalg.inv(T_true) @ T).astype(np.float32)))))
    assert err.max() < 1e-2, err
