"""Dataset fidelity details: trainskip subsampling and tracking-edge
exclusion in GO pixel sampling (VERDICT r1 items 7/9)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mipsfusion_tpu.datasets.dataset import ReplicaDataset
from mipsfusion_tpu.slam.tracker import sample_pixels_mix


def _make_replica_dir(tmp_path, n=8):
    import cv2
    d = tmp_path / "seq"
    (d / "results").mkdir(parents=True)
    for i in range(n):
        cv2.imwrite(str(d / "results" / f"frame{i:06d}.jpg"),
                    np.full((16, 16, 3), i * 10, np.uint8))
        cv2.imwrite(str(d / "results" / f"depth{i:06d}.png"),
                    np.full((16, 16), 1000 + i, np.uint16))
    with open(d / "traj.txt", "w") as f:
        for i in range(n):
            T = np.eye(4)
            T[0, 3] = float(i)
            f.write(" ".join(str(v) for v in T.reshape(-1)) + "\n")
    return str(d)


def _tiny_cfg():
    return {
        "cam": {"H": 16, "W": 16, "fx": 8.0, "fy": 8.0, "cx": 7.5,
                "cy": 7.5, "png_depth_scale": 1000.0, "crop_edge": 0},
        "data": {"downsample": 1},
    }


def test_trainskip_subsamples_frames(tmp_path):
    base = _make_replica_dir(tmp_path, n=8)
    ds_full = ReplicaDataset(_tiny_cfg(), base, trainskip=1)
    ds_skip = ReplicaDataset(_tiny_cfg(), base, trainskip=3)
    assert ds_full.num_frames == 8
    assert ds_skip.num_frames == 3          # frames 0, 3, 6
    assert ds_skip.frame_ids == [0, 3, 6]
    # the poses follow the same subsampling
    assert np.isclose(ds_skip.poses[1][0, 3], 3.0)
    assert np.isclose(ds_skip[2]["c2w"][0, 3], 6.0)


def test_sample_pixels_mix_honors_edges():
    H, W, edge_h, edge_w = 64, 96, 8, 12
    depth = jnp.ones((H, W))
    rr, cc = sample_pixels_mix(jax.random.PRNGKey(0), H, W, 4, 4, depth,
                               200, edge_h=edge_h, edge_w=edge_w)
    rr, cc = np.asarray(rr), np.asarray(cc)
    assert rr.min() >= edge_h and rr.max() <= H - 1 - edge_h
    assert cc.min() >= edge_w and cc.max() <= W - 1 - edge_w


def test_sample_pixels_mix_edge_clamp_small_images():
    # a 20px margin on a 16px image must not eliminate every pixel
    H, W = 16, 16
    depth = jnp.ones((H, W))
    rr, cc = sample_pixels_mix(jax.random.PRNGKey(0), H, W, 2, 2, depth,
                               16, edge_h=20, edge_w=20)
    assert len(np.asarray(rr)) == 16
