"""RGB-D dataset readers: Replica, ScanNet, FastCaMo(-synth/-large) formats.

Format/semantics parity with /root/reference/datasets/dataset.py:10-341:
  * per-frame dict {frame_id, c2w (4,4), rgb (H,W,3) in [0,1],
    depth (H,W) metric, direction (H,W,3) OpenGL rays};
  * GT poses converted to the OpenGL camera convention
    (columns 1 and 2 of the rotation negated);
  * depth = png / png_depth_scale * sc_factor; rgb resized to the depth
    resolution; optional integer downsample and edge cropping.

Unlike the reference (torch Dataset + CUDA DataLoader workers), frames
here are plain numpy; the SLAM loop moves them on-device itself and
prefetches the next frame while the current one is being tracked.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List

import numpy as np

from ..ops.geometry import get_camera_rays

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target env
    cv2 = None


def get_dataset(config: Dict):
    """Dispatch on config['dataset'] (ref datasets/dataset.py:10-21)."""
    name = config["dataset"]
    if name == "replica":
        cls = ReplicaDataset
    elif name == "scannet":
        cls = ScannetDataset
    elif name in ("fastcamo_synth", "fastcamo_large"):
        cls = FastCaMoDataset
    elif name == "synthetic":
        from .synthetic import SyntheticDataset
        syn = config.get("synthetic", {})
        return SyntheticDataset(config, n_frames=syn.get("n_frames", 200),
                                trajectory=syn.get("trajectory", "orbit"),
                                span=syn.get("span", 1.0))
    else:
        raise ValueError(f"unknown dataset '{name}'")
    return cls(config, config["data"]["datadir"],
               trainskip=config["data"].get("trainskip", 1),
               downsample_factor=config["data"].get("downsample", 1),
               sc_factor=config["data"].get("sc_factor", 1.0))


def _opengl_pose(mat: np.ndarray, sc_factor: float = 1.0) -> np.ndarray:
    """4x4 gt pose -> OpenGL camera convention (negate columns 1, 2)."""
    c2w = mat.astype(np.float64).copy()
    c2w[:3, 1] *= -1
    c2w[:3, 2] *= -1
    c2w[:3, 3] *= sc_factor
    return c2w.astype(np.float32)


class BaseDataset:
    """Shared camera/config handling (ref BaseDataset :24-42)."""

    def __init__(self, cfg: Dict):
        cam, data = cfg["cam"], cfg["data"]
        ds = data.get("downsample", 1)
        self.png_depth_scale = cam["png_depth_scale"]
        self.H, self.W = cam["H"] // ds, cam["W"] // ds
        self.fx, self.fy = cam["fx"] / ds, cam["fy"] / ds
        self.cx, self.cy = cam["cx"] / ds, cam["cy"] / ds
        self.distortion = np.array(cam["distortion"]) if cam.get("distortion") else None
        # undistortion runs at NATIVE resolution (before downsample/crop)
        self._K_native = np.array(
            [[cam["fx"], 0.0, cam["cx"]],
             [0.0, cam["fy"], cam["cy"]],
             [0.0, 0.0, 1.0]], np.float64)
        self._undistort_maps = None
        self.crop_size = cam.get("crop_edge", 0)
        self.ignore_w = cfg.get("tracking", {}).get("ignore_edge_W", 0)
        self.ignore_h = cfg.get("tracking", {}).get("ignore_edge_H", 0)
        self.total_pixels = ((self.H - self.crop_size * 2)
                             * (self.W - self.crop_size * 2))
        self.rays_d = None

    def _apply_crop(self):
        """Shrink intrinsics by crop_edge (ScanNet/FastCaMo semantics)."""
        edge = self.crop_size
        if edge > 0:
            self.H -= edge * 2
            self.W -= edge * 2
            self.cx -= edge
            self.cy -= edge

    def _make_rays(self):
        self.rays_d = np.asarray(get_camera_rays(
            self.H, self.W, self.fx, self.fy, self.cx, self.cy),
            dtype=np.float32)

    def _undistort(self, color: np.ndarray, depth: np.ndarray):
        """Lens-distortion correction at native resolution.

        The reference only *stores* cam.distortion and raises
        NotImplementedError when it is set (ref datasets/dataset.py:31,
        79,170,279); here the correction is actually applied: bilinear
        undistort for color, nearest-neighbor remap for depth (bilinear
        would blend depths across occlusion boundaries).
        """
        if self._undistort_maps is None:
            h, w = depth.shape
            m1, m2 = cv2.initUndistortRectifyMap(
                self._K_native, self.distortion, None, self._K_native,
                (w, h), cv2.CV_32FC1)
            self._undistort_maps = (m1, m2)
        m1, m2 = self._undistort_maps
        color = cv2.remap(color, m1, m2, cv2.INTER_LINEAR)
        depth = cv2.remap(depth, m1, m2, cv2.INTER_NEAREST)
        return color, depth

    def _load_frame(self, color_path: str, depth_path: str,
                    downsample_factor: int, sc_factor: float):
        if cv2 is None:
            raise RuntimeError("cv2 is required for file-based datasets")
        color = cv2.cvtColor(cv2.imread(color_path), cv2.COLOR_BGR2RGB)
        depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        color = color.astype(np.float32) / 255.0
        depth = depth.astype(np.float32) / self.png_depth_scale * sc_factor
        if self.distortion is not None:
            H0, W0 = depth.shape
            if color.shape[:2] != (H0, W0):
                color = cv2.resize(color, (W0, H0))
            color, depth = self._undistort(color, depth)

        H, W = depth.shape
        color = cv2.resize(color, (W, H))
        if downsample_factor > 1:
            H, W = H // downsample_factor, W // downsample_factor
            color = cv2.resize(color, (W, H), interpolation=cv2.INTER_AREA)
            depth = cv2.resize(depth, (W, H), interpolation=cv2.INTER_NEAREST)

        edge = self.crop_size
        if edge > 0:
            color = color[edge:-edge, edge:-edge]
            depth = depth[edge:-edge, edge:-edge]
        return color.astype(np.float32), depth

    def __len__(self):
        return self.num_frames

    def frame(self, index: int, color_path: str, depth_path: str,
              downsample_factor: int, sc_factor: float) -> Dict:
        rgb, depth = self._load_frame(color_path, depth_path,
                                      downsample_factor, sc_factor)
        if self.rays_d is None:
            self._make_rays()
        return {
            "frame_id": self.frame_ids[index],
            "c2w": self.poses[index],
            "rgb": rgb,
            "depth": depth,
            "direction": self.rays_d,
        }


def _sorted_by_stem(pattern: str) -> List[str]:
    return sorted(glob.glob(pattern),
                  key=lambda x: int(os.path.basename(x).split(".")[0]))


def _apply_trainskip(ds, trainskip: int) -> None:
    """Subsample every ``trainskip``-th frame across all per-frame lists.

    The reference parses data.trainskip and stores it on every dataset
    (/root/reference/datasets/dataset.py:20,50) but never applies it to
    the frame lists; here the evident intent is honored.
    """
    if trainskip <= 1:
        return
    sl = slice(None, None, trainskip)
    ds.img_files = ds.img_files[sl]
    ds.depth_paths = ds.depth_paths[sl]
    ds.poses = ds.poses[sl]
    ds.frame_ids = ds.frame_ids[sl]


class ReplicaDataset(BaseDataset):
    """results/frame*.jpg + results/depth*.png + traj.txt (ref :45-123)."""

    def __init__(self, cfg, basedir, trainskip=1, downsample_factor=1,
                 sc_factor=1.0):
        super().__init__(cfg)
        self.basedir = basedir
        self.downsample_factor = downsample_factor
        self.sc_factor = sc_factor
        self.img_files = sorted(glob.glob(f"{basedir}/results/frame*.jpg"))
        self.depth_paths = sorted(glob.glob(f"{basedir}/results/depth*.png"))
        self.poses = self._load_poses(os.path.join(basedir, "traj.txt"))
        self.frame_ids = list(range(len(self.img_files)))
        _apply_trainskip(self, trainskip)
        self.num_frames = len(self.frame_ids)

    def _load_poses(self, path):
        with open(path) as f:
            lines = f.readlines()
        return [_opengl_pose(np.array(list(map(float, lines[i].split())))
                             .reshape(4, 4), self.sc_factor)
                for i in range(len(self.img_files))]

    def __getitem__(self, index):
        return self.frame(index, self.img_files[index],
                          self.depth_paths[index],
                          self.downsample_factor, self.sc_factor)


class _PoseDirDataset(BaseDataset):
    """Common layout: color/<i>.<ext> + depth/<i>.png + pose/<i>.txt."""

    color_ext = "jpg"

    def __init__(self, cfg, basedir, trainskip=1, downsample_factor=1,
                 sc_factor=1.0):
        super().__init__(cfg)
        self.basedir = basedir
        self.downsample_factor = downsample_factor
        self.sc_factor = sc_factor
        start = cfg["data"].get("starting_frame", 0)
        self.img_files = [p for p in _sorted_by_stem(
            os.path.join(basedir, "color", f"*.{self.color_ext}"))
            if int(os.path.basename(p).split(".")[0]) >= start]
        self.depth_paths = [p for p in _sorted_by_stem(
            os.path.join(basedir, "depth", "*.png"))
            if int(os.path.basename(p).split(".")[0]) >= start]
        self.poses = self._load_poses(os.path.join(basedir, "pose"), start)
        self.frame_ids = list(range(len(self.img_files)))
        _apply_trainskip(self, trainskip)
        self.num_frames = len(self.frame_ids)
        self._apply_crop()
        self._make_rays()

    def _load_poses(self, path, start):
        poses = []
        for i, pose_path in enumerate(_sorted_by_stem(os.path.join(path, "*.txt"))):
            if i < start:
                continue
            with open(pose_path) as f:
                vals = [list(map(float, line.split())) for line in f
                        if line.strip()]
            poses.append(_opengl_pose(np.array(vals).reshape(4, 4)))
        return poses

    def __getitem__(self, index):
        return self.frame(index, self.img_files[index],
                          self.depth_paths[index],
                          self.downsample_factor, self.sc_factor)


class ScannetDataset(_PoseDirDataset):
    color_ext = "jpg"


class FastCaMoDataset(_PoseDirDataset):
    color_ext = "png"
