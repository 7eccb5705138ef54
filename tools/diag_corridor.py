"""Diagnose the fast-profile corridor ATE divergence (VERDICT r3 #2).

Runs the corridor scene (tests/test_sharded_refine.py recipe) at the
full tiny budget and at the fast-profile cut, printing per-frame world
translation error, submap events, and pose-gate rejections — to locate
WHERE the fast profile loses the trajectory (gradual drift vs a switch
event vs a single rejected frame).

    JAX_PLATFORMS=cpu python tools/diag_corridor.py [--leg fast|full]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


FAST_TRACKING = {
    ("tracking", "iter"): 8, ("tracking", "iter_RO"): 4,
    ("tracking", "sample"): 256,
    ("tracking", "RO", "particle_size"): 512,
    ("tracking", "RO", "n_rows"): 12, ("tracking", "RO", "n_cols"): 16,
}
FAST_MAPPING = {
    ("mapping", "sample"): 384, ("mapping", "pixels_cur"): 128,
    ("mapping", "iters"): 7,
}
FAST_Z = {("training", "n_samples_d"): 10, ("training", "n_range_d"): 7}


def _apply(cfg, overrides):
    for path, v in overrides.items():
        node = cfg
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = v
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", default="fast",
                    choices=["fast", "full", "fast_tracking",
                             "fast_mapping", "fast_z"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frames", type=int, default=None,
                    help="corridor length in frames (same path; more "
                         "frames = slower per-frame motion)")
    ap.add_argument("--set", action="append", default=[],
                    help="dotted config override, e.g. "
                         "tracking.RO.initial_scaling_factor=0.04")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        enable_compile_cache()   # re-resolve to the cpu cache dir

    from test_sharded_refine import corridor_cfg

    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = corridor_cfg(sharded=False) if args.frames is None \
        else corridor_cfg(n_frames=args.frames, sharded=False)
    cfg["mapping"]["first_iters"] = 150
    cfg["seed"] = args.seed
    if args.leg == "fast":
        _apply(cfg, {**FAST_TRACKING, **FAST_MAPPING, **FAST_Z})
    elif args.leg == "fast_tracking":
        _apply(cfg, FAST_TRACKING)
    elif args.leg == "fast_mapping":
        _apply(cfg, FAST_MAPPING)
    elif args.leg == "fast_z":
        _apply(cfg, FAST_Z)
    for ov in args.set:
        path, v = ov.split("=")
        node = cfg
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        try:
            node[keys[-1]] = int(v)
        except ValueError:
            node[keys[-1]] = float(v)

    n = cfg["synthetic"]["n_frames"]
    ds = SyntheticDataset(cfg, n_frames=n, trajectory="corridor", span=1.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)

    events = []
    orig_new = slam.active_submap_switch_new
    orig_back = slam.active_submap_switch

    def spy_new(frame, i, kf_id):
        events.append(("new", i))
        return orig_new(frame, i, kf_id)

    def spy_back(frame, i, kf_id):
        events.append(("back", i))
        return orig_back(frame, i, kf_id)

    slam.active_submap_switch_new = spy_new
    slam.active_submap_switch = spy_back

    for i in range(n):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)

    world = slam.world_trajectory(n - 1)
    gt = np.stack([ds.gt_pose(i) for i in range(n)])
    err = np.linalg.norm(world[:, :3, 3] - gt[:, :3, 3], axis=1)
    acc = [bool(a) for a in np.asarray(
        jax.device_get(slam.track_accepted))] if slam.track_accepted else []
    ev = dict((i, k) for k, i in events)
    if not args.quiet:
        for i in range(n):
            tag = ev.get(i, "")
            rej = "" if (i == 0 or i > len(acc) or acc[i - 1]) \
                else "REJECTED"
            print(f"f{i:3d} err={err[i] * 1000:7.1f} mm "
                  f"submap_ev={tag:4s} {rej}")
    res = slam.evaluate(n - 1)
    print(f"\nleg={args.leg} ATE RMSE "
          f"{res['absolute_translational_error.rmse'] * 1000:.1f} mm  "
          f"submaps={slam._host_used} events={events}")


if __name__ == "__main__":
    main()
