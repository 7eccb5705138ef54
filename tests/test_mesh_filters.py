"""Unit tests for the reference-parity mesh cleanup filters
(ref /root/reference/model/Mesher.py:223-281, :360-366)."""

import numpy as np

from mipsfusion_tpu.mesher.mesher import (apply_visibility_filters,
                                          filter_unseen_faces,
                                          point_seen_mask,
                                          remove_small_components)


def _quad(origin, size):
    o = np.asarray(origin, np.float64)
    v = np.asarray([o, o + [size, 0, 0], o + [size, size, 0],
                    o + [0, size, 0]])
    f = np.asarray([[0, 1, 2], [0, 2, 3]])
    return v, f


def test_remove_small_components_drops_tiny_island():
    v1, f1 = _quad([0, 0, 0], 2.0)          # area 4 m^2 -> kept
    v2, f2 = _quad([10, 0, 0], 0.1)         # area 0.01 m^2 -> dropped
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    colors = np.random.rand(8, 3)
    nv, nf, nc = remove_small_components(verts, faces, colors,
                                         min_area=0.5)
    assert len(nv) == 4
    assert len(nf) == 2
    assert np.allclose(nv, v1)
    assert np.allclose(nc, colors[:4])
    assert nf.max() < len(nv)


def test_remove_small_components_keeps_all_when_large():
    v, f = _quad([0, 0, 0], 3.0)
    nv, nf, _ = remove_small_components(v, f, None, min_area=0.5)
    assert len(nv) == 4 and len(nf) == 2


def test_filter_unseen_faces_loose_rule():
    # face dropped only when ALL three vertices are unseen (ref loose
    # reduce_and rule, Mesher.py:227-229)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]])
    seen = np.asarray([True, False, False, False, False, False])
    out = filter_unseen_faces(faces, seen)
    assert len(out) == 1 and (out[0] == [0, 1, 2]).all()


def test_point_seen_mask_frustum():
    H, W = 240, 320
    K = np.asarray([[160.0, 0, 159.5], [0, 160.0, 119.5], [0, 0, 1.0]])
    # keyframe at origin, OpenGL forward = -z
    kf_pose = np.eye(4)[None]
    max_d = np.asarray([5.0])
    pts = np.asarray([
        [0.0, 0.0, -2.0],    # straight ahead -> seen
        [0.0, 0.0, 2.0],     # behind -> unseen
        [0.0, 0.0, -20.0],   # beyond max depth -> unseen
        [50.0, 0.0, -2.0],   # far outside frustum -> unseen
    ])
    seen = point_seen_mask(pts, kf_pose, K, H, W, max_d)
    assert seen.tolist() == [True, False, False, False]


def test_apply_visibility_filters_end_to_end():
    H, W = 240, 320
    K = np.asarray([[160.0, 0, 159.5], [0, 160.0, 119.5], [0, 0, 1.0]])
    kf_pose = np.eye(4)[None]
    max_d = np.asarray([10.0])
    # a big quad in front of the camera + a big quad behind it
    v1, f1 = _quad([-1, -1, -3], 2.0)
    v2, f2 = _quad([-1, -1, 3], 2.0)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    nv, nf, _ = apply_visibility_filters(verts, faces, None, kf_pose, K,
                                         H, W, max_d,
                                         min_component_area=0.5)
    # only the in-front quad survives: no geometry in never-observed space
    assert len(nv) == 4
    assert np.allclose(nv[:, 2], -3.0)


import pytest as _pytest


@_pytest.mark.slow
def test_slam_mesh_has_no_geometry_in_unobserved_space():
    """Independent oracle: a camera that never looks toward +z must not
    produce mesh geometry deep in the +z half of the room (the filters
    cull hallucinated surfaces in never-observed space,
    ref Mesher.py:245-281)."""
    import pytest
    pytest.importorskip("scipy")
    import sys
    sys.path.insert(0, "tests")
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU
    from test_slam_single import tiny_config

    n = 24
    cfg = tiny_config(n)
    cfg["use_manager"] = False
    # hold the camera near the origin with minimal motion: it always
    # looks along -z, so z > +0.5 is never observed
    ds = SyntheticDataset(cfg, n_frames=n, trajectory="orbit",
                          span=0.02)
    slam = MIPSFusionTPU(cfg, dataset=ds)

    def frame(i):
        return {"frame_id": i, "c2w": ds.gt_pose(i)}

    slam.first_frame_mapping(frame(0), 150)
    for i in range(1, n):
        slam.process_frame(frame(i), i)
    verts, faces, _ = slam.extract_mesh(joint=False, voxel_size=0.15)
    assert len(verts) > 0, "mesh extraction produced nothing"
    assert (verts[:, 2] < 1.0).all(), (
        f"mesh contains geometry in never-observed space: "
        f"max z = {verts[:, 2].max():.2f}")
