"""Procedural synthetic RGB-D sequence: an analytic box room with props.

The reference is driven by recorded RGB-D datasets (FastCaMo / Replica /
ScanNet); none are vendored here, so this module provides an exact-GT
synthetic sequence for integration tests and benchmarking: an axis-
aligned room containing boxes and a sphere, rendered by sphere-tracing
the analytic SDF along the OpenGL pixel rays. Camera trajectories sweep
through the room (optionally far enough to exercise multi-submap
allocation and loop closure).

Rendering runs as one jitted raycast per frame; depth and a procedural
albedo are exact, so ATE and reconstruction metrics have a clean ground
truth.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import get_camera_rays


# ---------------------------------------------------------------------------
# Analytic scene SDF (room interior = free space)
# ---------------------------------------------------------------------------

def _sd_box(p, center, half):
    q = jnp.abs(p - center) - half
    return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
            + jnp.minimum(jnp.max(q, axis=-1), 0.0))


def _sd_sphere(p, center, r):
    return jnp.linalg.norm(p - center, axis=-1) - r


def _sd_box_rot(p, center, half, yaw):
    """Axis-aligned box rotated by ``yaw`` about +y (breaks the sliding
    ambiguity that pure axis-aligned planes create for depth-only
    tracking)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    q = p - center
    qr = jnp.stack([c * q[..., 0] - s * q[..., 2], q[..., 1],
                    s * q[..., 0] + c * q[..., 2]], axis=-1)
    return _sd_box(qr, jnp.zeros(3), half)


def scene_sdf(p: jnp.ndarray, room_half: jnp.ndarray) -> jnp.ndarray:
    """SDF of the scene: negative inside solid matter."""
    # room walls: complement of the interior box
    d_room = -_sd_box(p, jnp.zeros(3), room_half)
    d1 = _sd_box_rot(p, jnp.asarray([1.2, -0.8, -1.0]),
                     jnp.asarray([0.5, 0.5, 0.5]), 0.6)
    d2 = _sd_box_rot(p, jnp.asarray([-1.5, 0.6, 1.2]),
                     jnp.asarray([0.4, 0.9, 0.4]), -0.8)
    d3 = _sd_sphere(p, jnp.asarray([0.3, 1.0, 0.8]), 0.55)
    d4 = _sd_box_rot(p, jnp.asarray([-0.2, -1.4, 0.2]),
                     jnp.asarray([0.9, 0.25, 0.6]), 0.35)
    d5 = _sd_sphere(p, jnp.asarray([-1.8, -1.2, -1.4]), 0.5)
    d6 = _sd_box_rot(p, jnp.asarray([1.8, 1.2, 1.5]),
                     jnp.asarray([0.45, 0.6, 0.3]), -0.4)
    d = jnp.minimum(jnp.minimum(d_room, d1), jnp.minimum(d2, d3))
    return jnp.minimum(jnp.minimum(d, d4), jnp.minimum(d5, d6))


def scene_sdf_tiled(p: jnp.ndarray, room_half: jnp.ndarray) -> jnp.ndarray:
    """Large-scene SDF: room walls + a domain-repeated prop field.

    The classic prop set (scene_sdf) clusters near the origin of a
    ~3 m room; the scale-envelope scenes (reference regime: 10-20
    submaps over long trajectories, /root/reference/configs/
    FastCaMo-large/floor1.yaml:8) need geometry everywhere the camera
    goes, so props repeat on a 2.4 m grid in x/z with per-cell jitter.
    Each cell holds a floor box and a floating sphere; props stay well
    inside their cell, so the repeated SDF stays exact for the sphere
    tracer."""
    d_room = -_sd_box(p, jnp.zeros(3), room_half)

    cell = 2.4
    ci = jnp.floor(p[..., 0] / cell)
    cj = jnp.floor(p[..., 2] / cell)
    # per-cell deterministic jitter in [-1, 1)
    def h(k):
        v = jnp.sin(ci * 12.9898 + cj * 78.233 + k * 37.719) * 43758.5453
        return 2.0 * (v - jnp.floor(v)) - 1.0

    # local coords within the cell, origin at the cell center
    q = jnp.stack([p[..., 0] - (ci + 0.5) * cell, p[..., 1],
                   p[..., 2] - (cj + 0.5) * cell], axis=-1)
    jx, jz, jy = 0.45 * h(1.0), 0.45 * h(2.0), h(3.0)
    yaw = 1.2 * h(4.0)
    floor_y = -room_half[1]
    box_half = jnp.asarray([0.38, 0.55, 0.32])
    box_c = jnp.stack([jx, jnp.broadcast_to(floor_y + box_half[1],
                                            jx.shape), jz], axis=-1)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    qb = q - box_c
    qr = jnp.stack([c * qb[..., 0] - s * qb[..., 2], qb[..., 1],
                    s * qb[..., 0] + c * qb[..., 2]], axis=-1)
    d_box = _sd_box(qr, jnp.zeros(3), box_half)

    sph_c = jnp.stack([-jx, 0.3 + 0.5 * jy, -jz], axis=-1)
    d_sph = jnp.linalg.norm(q - sph_c, axis=-1) - 0.35

    return jnp.minimum(d_room, jnp.minimum(d_box, d_sph))


def scene_albedo(p: jnp.ndarray) -> jnp.ndarray:
    """Procedural color field in [0,1]^3: smooth base + two higher-
    frequency octaves (~0.8 m and ~0.25 m wavelength).

    The reference's benchmark data (FastCaMo / Replica / ScanNet) is
    textured indoor imagery; a texture-poor albedo makes photometric
    pose refinement unobservable along walls (the sliding null space),
    which tests the scene, not the tracker. The octaves restore the
    texture gradients real sequences have while keeping the field
    exactly representable (smooth, bounded)."""
    base = jnp.stack([
        jnp.sin(1.7 * p[..., 0] + 0.5 * p[..., 1]),
        jnp.sin(1.3 * p[..., 1] + 0.7 * p[..., 2] + 2.0),
        jnp.sin(1.1 * p[..., 2] + 0.9 * p[..., 0] + 4.0),
    ], axis=-1)
    mid = jnp.stack([
        jnp.sin(7.9 * p[..., 0] + 5.3 * p[..., 2]),
        jnp.sin(6.7 * p[..., 1] + 7.1 * p[..., 0] + 1.0),
        jnp.sin(7.3 * p[..., 2] + 6.1 * p[..., 1] + 3.0),
    ], axis=-1)
    fine = jnp.stack([
        jnp.sin(24.0 * p[..., 0] + 19.0 * p[..., 1] + 1.3),
        jnp.sin(21.0 * p[..., 1] + 23.0 * p[..., 2] + 4.1),
        jnp.sin(26.0 * p[..., 2] + 20.0 * p[..., 0] + 2.2),
    ], axis=-1)
    return 0.5 + 0.3 * base + 0.14 * mid + 0.06 * fine


@partial(jax.jit, static_argnames=("n_steps", "props"))
def _raycast(rays_o, rays_d, room_half, far, n_steps: int = 96,
             props: str = "classic"):
    """Sphere-trace [N,3] rays; returns (depth [N], hit mask [N])."""
    sdf = scene_sdf_tiled if props == "tiled" else scene_sdf

    def body(i, carry):
        t, done = carry
        p = rays_o + rays_d * t[:, None]
        d = sdf(p, room_half)
        hit = jnp.abs(d) < 1e-3
        done = done | hit
        t = jnp.where(done, t, t + jnp.clip(d, 1e-3, 0.5))
        return t, done

    t0 = jnp.full(rays_o.shape[0], 1e-3)
    t, done = jax.lax.fori_loop(0, n_steps, body, (t0, jnp.zeros_like(t0, bool)))
    valid = done & (t < far)
    return jnp.where(valid, t, 0.0), valid


class SyntheticDataset:
    """Map-style dataset mirroring the reference's per-frame dict contract.

    Frames are rendered entirely ON DEVICE (``packed(i)`` returns the
    device-resident [H, W, 7] = (direction, rgb, depth) frame); the
    numpy dict of ``__getitem__`` is derived from it on demand. The SLAM
    loop consumes ``packed`` directly, so the per-frame host<->device
    transfers of the reference's DataLoader path disappear.
    """

    def __init__(self, cfg: Dict, n_frames: int = 200,
                 trajectory: str = "orbit", seed: int = 0,
                 span: float = 1.0, device_cache: int = 0):
        # span < 1 covers only the first fraction of the trajectory,
        # keeping per-frame motion realistic for short test sequences
        self.span = span
        cam = cfg["cam"]
        ds = cfg["data"].get("downsample", 1)
        self.H, self.W = cam["H"] // ds, cam["W"] // ds
        self.fx, self.fy = cam["fx"] / ds, cam["fy"] / ds
        self.cx, self.cy = cam["cx"] / ds, cam["cy"] / ds
        self.far = cam["far"]
        self.num_frames = n_frames
        self.frame_ids = list(range(n_frames))
        syn = cfg.get("synthetic", {})
        self.room_half = jnp.asarray(syn.get("room_half", [3.0, 2.2, 2.5]))
        self.props = syn.get("props", "classic")
        # peak yaw offset (rad) of the "revisit" return leg
        self._revisit_amp = syn.get("revisit_amp", 0.9)
        # where in the return leg (ret in (0, 1]) the yaw bump peaks
        self._revisit_phase = syn.get("revisit_phase", 0.5)
        # Sensor-noise model (VERDICT r4 item 7). The reference consumes
        # real RGB-D with quantized, noisy, hole-ridden depth
        # (ref datasets/dataset.py:83-90 depth-scale path, :172-180);
        # the analytic renders here are exact, so an optional noise
        # stage restores that envelope:
        #   depth_sigma: [a, b] -> sigma(d) = a + b * d^2 (Kinect-style
        #                axial noise growing quadratically with range)
        #   dropout:     iid probability a valid depth pixel becomes a
        #                hole (depth 0), like IR shadowing/low albedo
        #   quantize:    depth discretization step in meters (real
        #                pipelines store mm uint16: png_depth_scale)
        #   rgb_sigma:   additive Gaussian shot noise on the albedo
        self.noise = syn.get("noise", None)
        self._noise_key = jax.random.PRNGKey(syn.get("noise_seed", seed))

        self._rays_d_dev = get_camera_rays(self.H, self.W, self.fx,
                                           self.fy, self.cx, self.cy)
        self.rays_d = np.asarray(self._rays_d_dev)
        self.poses = [self._pose(i, trajectory) for i in range(n_frames)]
        self._cache: Dict[int, Dict] = {}
        # device frame cache: 0 = unbounded (bench/test sequences are
        # short); > 0 keeps the most recent N packed frames on device
        self._device_cache_max = device_cache
        self._dev_cache: Dict[int, jnp.ndarray] = {}
        self._dev_order: list = []

    # -- camera trajectory --------------------------------------------------
    def _pose(self, i: int, trajectory: str) -> np.ndarray:
        t = self.span * i / max(self.num_frames - 1, 1)
        if trajectory == "orbit":
            # slow yaw sweep from near the room center
            ang = 0.9 * np.sin(2 * np.pi * t)
            pos = np.array([0.8 * np.sin(2 * np.pi * t),
                            0.3 * np.sin(4 * np.pi * t),
                            0.5 * np.cos(2 * np.pi * t)])
        elif trajectory == "corridor":
            # translate along x while yawing — leaves the initial submap
            # bound. Yaw 0.3*sin(2*pi*t): ~1-2.5 deg/frame peak at the
            # 45-90 frame lengths the tests use — representative indoor
            # scanning motion. (The original 0.6*sin(4*pi*t) peaked at
            # ~10 deg/frame at 45 frames — far beyond the reference's
            # envelope, which made corridor ATE a basin-escape lottery
            # for EVERY budget profile; see tools/diag_corridor.py.)
            ang = 0.3 * np.sin(2 * np.pi * t)
            pos = np.array([-2.0 + 4.0 * t, 0.2 * np.sin(2 * np.pi * t), 0.0])
        elif trajectory == "loop":
            # go out and return to the start (exercises loop closure)
            s = np.sin(np.pi * t)
            ang = 1.4 * s
            pos = np.array([2.2 * s, 0.0, 0.8 * np.sin(2 * np.pi * t)])
        elif trajectory == "outback":
            # straight out along +x and straight back, constant heading:
            # the return leg revisits the exact starting views, which
            # must trigger a switch back to the first submap
            tri = 1.0 - abs(2.0 * t - 1.0)   # 0 -> 1 -> 0
            ang = 0.25 * np.sin(2 * np.pi * t)
            pos = np.array([2.4 * tri, 0.15 * np.sin(4 * np.pi * t), 0.0])
        elif trajectory == "sweep":
            # fast-motion stressor: aggressive AND jerky yaw — FAST
            # CAmera MOtion is the reference's headline regime (its RO
            # exists for it, ref RandomOptimizer.py). The slow term
            # sets the sweep; the high-frequency term is what defeats
            # the constant-velocity prediction (at 60 frames, span 1:
            # ~3.2 deg/frame rate and ~2 deg/frame^2 acceleration from
            # the fast term alone; ~6 deg/frame combined peak) — between
            # the gentle corridor (~1-2.5 deg/frame) and the retired
            # ~10 deg/frame basin-escape lottery (tools/diag_corridor).
            ang = 0.45 * np.sin(2 * np.pi * t) + 0.09 * np.sin(12 * np.pi * t)
            pos = np.array([0.6 * np.sin(2 * np.pi * t),
                            0.15 * np.sin(4 * np.pi * t),
                            0.4 * np.cos(2 * np.pi * t)])
        elif trajectory == "revisit":
            # wait-loop arming scene (ref Manager.py:494-518): out along
            # +x like outback, but the return leg re-enters the first
            # submap's region with a LARGE yaw offset — the containing
            # ratio (AABB-based, view-independent) says "previous
            # submap" (case 5) while the view barely overlaps the
            # outbound keyframes, so the reprojection verify fails on
            # min_pts -> case 5.2 arms the wait loop. The offset then
            # eases back toward the outbound heading, the verify
            # matures, and the switch issues via msg1 with
            # localMLP_Id_wait.
            tri = 1.0 - abs(2.0 * t - 1.0)   # 0 -> 1 -> 0
            ret = max(0.0, 2.0 * t - 1.0)    # 0 on the way out, ->1 home
            amp = getattr(self, "_revisit_amp", 0.9)
            # yaw-offset BUMP on the return leg: peaks amp at
            # ret = revisit_phase, decays to zero by 2*phase — so the
            # first re-entry keyframe sees a large off-axis view (verify
            # fails on min_pts -> case 5.2 arms the wait loop) and a
            # few keyframes later the view re-aligns (verify matures ->
            # msg1 switch with localMLP_Id_wait)
            p = getattr(self, "_revisit_phase", 0.5)
            bump = np.sin(np.pi * np.clip(ret / (2.0 * p), 0.0, 1.0))
            ang = 0.25 * np.sin(2 * np.pi * t) + amp * bump
            pos = np.array([2.4 * tri, 0.15 * np.sin(4 * np.pi * t), 0.0])
        elif trajectory == "snake":
            # scale-envelope trajectory (reference regime: 10-20 submaps
            # over 2000+ frame sequences, ref configs/FastCaMo-large/
            # floor1.yaml:8): serpentine sweep across a LARGE room
            # (props="tiled") and back along the same path. Constant
            # heading, so the return leg revisits the outbound views —
            # every submap spawned on the way out must be switched back
            # into on the way home.
            tri = 1.0 - abs(2.0 * t - 1.0)   # 0 -> 1 -> 0
            ang = 0.2 * np.sin(2 * np.pi * t)
            pos = np.array([-4.4 + 8.8 * tri,
                            0.12 * np.sin(4 * np.pi * t),
                            2.2 * np.sin(1.5 * np.pi * tri)])
        else:
            raise ValueError(trajectory)

        c, s_ = np.cos(ang), np.sin(ang)
        # yaw about +y (OpenGL camera looks along -z)
        R = np.array([[c, 0, s_], [0, 1, 0], [-s_, 0, c]])
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos
        return c2w

    # -- rendering ----------------------------------------------------------
    def _render_packed(self, c2w: jnp.ndarray) -> jnp.ndarray:
        """One jitted device render -> packed [H, W, 7] (dir, rgb, depth)."""
        dirs = self._rays_d_dev.reshape(-1, 3)      # OpenGL dirs, dz = -1
        norms = jnp.linalg.norm(dirs, axis=-1)
        rays_d_w = dirs @ c2w[:3, :3].T
        unit_d = rays_d_w / norms[:, None]
        rays_o_w = jnp.broadcast_to(c2w[:3, 3], rays_d_w.shape)
        s, valid = _raycast(rays_o_w, unit_d, self.room_half,
                            self.far * 2.0, props=self.props)
        pts = rays_o_w + unit_d * s[:, None]
        rgb = jnp.where(valid[:, None], scene_albedo(pts), 0.0)
        # z-depth convention: pts = o + dirs * depth with |dir_z| = 1, so
        # depth = euclidean distance / ||dirs|| (matches the reference's
        # target_d semantics, datasets/dataset.py depth images)
        depth = s / norms
        depth = jnp.where(valid & (depth < self.far), depth, 0.0)
        H, W = self.H, self.W
        return jnp.concatenate(
            [self._rays_d_dev, rgb.reshape(H, W, 3),
             depth.reshape(H, W, 1)], axis=-1)

    def _make_noise_fn(self):
        """One jitted noise stage, parameters baked in as constants."""
        nz = self.noise
        a, b = nz.get("depth_sigma", (0.0, 0.0))
        dropout = float(nz.get("dropout", 0.0))
        quant = float(nz.get("quantize", 0.0))
        rgb_sigma = float(nz.get("rgb_sigma", 0.0))

        @jax.jit
        def apply(packed, key):
            rgb, depth = packed[..., 3:6], packed[..., 6]
            k1, k2, k3 = jax.random.split(key, 3)
            valid = depth > 0.0
            if a > 0.0 or b > 0.0:
                sigma = a + b * depth ** 2
                depth = depth + sigma * jax.random.normal(k1, depth.shape)
            if dropout > 0.0:
                keep = jax.random.uniform(k2, depth.shape) >= dropout
                valid = valid & keep
            if quant > 0.0:
                depth = jnp.round(depth / quant) * quant
            depth = jnp.where(valid & (depth > 0.0), depth, 0.0)
            if rgb_sigma > 0.0:
                rgb = jnp.clip(
                    rgb + rgb_sigma * jax.random.normal(k3, rgb.shape),
                    0.0, 1.0)
            return jnp.concatenate(
                [packed[..., :3], rgb, depth[..., None]], axis=-1)

        return apply

    def gt_pose(self, index: int) -> np.ndarray:
        return self.poses[index]

    def packed(self, index: int) -> jnp.ndarray:
        """Device-resident [H, W, 7] frame (direction, rgb, depth)."""
        if index not in self._dev_cache:
            if not hasattr(self, "_render_jit"):
                self._render_jit = jax.jit(self._render_packed)
            frame = self._render_jit(jnp.asarray(self.poses[index]))
            if self.noise:
                if not hasattr(self, "_noise_jit"):
                    self._noise_jit = self._make_noise_fn()
                frame = self._noise_jit(
                    frame, jax.random.fold_in(self._noise_key, index))
            self._dev_cache[index] = frame
            self._dev_order.append(index)
            if (self._device_cache_max
                    and len(self._dev_order) > self._device_cache_max):
                old = self._dev_order.pop(0)
                del self._dev_cache[old]
        return self._dev_cache[index]

    def _render(self, index: int) -> Dict:
        packed = np.asarray(self.packed(index))
        return {
            "frame_id": index,
            "c2w": self.poses[index],
            "rgb": packed[..., 3:6].astype(np.float32),
            "depth": packed[..., 6].astype(np.float32),
            "direction": self.rays_d.astype(np.float32),
        }

    def __len__(self):
        return self.num_frames

    def __getitem__(self, index: int) -> Dict:
        if index not in self._cache:
            self._cache[index] = self._render(index)
        return self._cache[index]
