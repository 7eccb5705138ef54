"""Full SLAM run through the FILE-BASED Replica reader (VERDICT r3 #8).

Every other integration run constructs SyntheticDataset directly; the
reference's only entry point is file-driven (ref main.py:19-20 ->
get_dataset). Here the synthetic scene is rendered to a Replica-format
tree on disk (results/frame*.jpg + results/depth*.png + traj.txt) and
the SLAM system runs on frames flowing through
datasets/dataset.py ReplicaDataset — covering jpg/png decode, depth
scaling, pose-convention conversion, and frame/pose alignment under
trainskip in one end-to-end path.
"""

import os

import numpy as np
import pytest

from mipsfusion_tpu.datasets.dataset import get_dataset
from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU
from test_slam_single import tiny_config

pytestmark = pytest.mark.slow

N_DISK = 72      # frames written to disk
TRAINSKIP = 2    # SLAM consumes every 2nd frame -> 36 frames


def _write_replica_tree(root: str, cfg) -> None:
    """Render the synthetic orbit and write it in Replica layout."""
    import cv2

    ds = SyntheticDataset(cfg, n_frames=N_DISK, trajectory="orbit",
                          span=N_DISK / 400.0)
    res = os.path.join(root, "results")
    os.makedirs(res, exist_ok=True)
    lines = []
    for i in range(N_DISK):
        fr = ds[i]
        bgr = cv2.cvtColor(
            (np.clip(fr["rgb"], 0, 1) * 255).astype(np.uint8),
            cv2.COLOR_RGB2BGR)
        # max-quality jpg: the reader expects frame*.jpg (ref :45-123)
        cv2.imwrite(os.path.join(res, f"frame{i:06d}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        cv2.imwrite(os.path.join(res, f"depth{i:06d}.png"),
                    np.round(fr["depth"] * 1000.0).astype(np.uint16))
        # traj.txt stores the pre-OpenGL pose; the reader negates
        # columns 1 and 2 (_opengl_pose), which is its own inverse
        T = fr["c2w"].astype(np.float64).copy()
        T[:3, 1] *= -1
        T[:3, 2] *= -1
        lines.append(" ".join(repr(float(v)) for v in T.reshape(-1)))
    with open(os.path.join(root, "traj.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_slam_through_replica_reader(tmp_path):
    cfg = tiny_config(N_DISK // TRAINSKIP)
    cfg["dataset"] = "replica"
    cfg["mapping"]["first_iters"] = 120
    cfg["data"] = {"datadir": str(tmp_path), "trainskip": TRAINSKIP,
                   "downsample": 1, "sc_factor": 1.0,
                   "starting_frame": 0, "output": None}
    cfg["cam"]["png_depth_scale"] = 1000.0
    _write_replica_tree(str(tmp_path), cfg)

    ds = get_dataset(cfg)
    assert type(ds).__name__ == "ReplicaDataset"
    assert ds.num_frames == N_DISK // TRAINSKIP
    # trainskip keeps frames and poses aligned: frame k on disk is
    # pose k on disk (a misalignment here survives per-frame
    # round-trip tests but wrecks SLAM)
    assert ds.frame_ids == list(range(0, N_DISK, TRAINSKIP))

    # the decoded depth matches the rendered depth to the 1 mm
    # quantization of the uint16 png
    syn = SyntheticDataset(cfg, n_frames=N_DISK, trajectory="orbit",
                           span=N_DISK / 400.0)
    f5 = ds[5]
    gt5 = syn[5 * TRAINSKIP]
    assert np.abs(f5["depth"] - gt5["depth"]).max() < 2e-3
    np.testing.assert_allclose(f5["c2w"], gt5["c2w"], atol=1e-6)

    slam = MIPSFusionTPU(cfg, dataset=ds)
    results = slam.run(verbose=False)
    ate = results["absolute_translational_error.rmse"]
    # the orbit at tiny budgets tracks to ~5-15 mm from device-rendered
    # frames; jpg chroma noise and 1 mm depth quantization cost a little
    assert ate < 0.05, f"file-reader SLAM diverged: ATE {ate}"
