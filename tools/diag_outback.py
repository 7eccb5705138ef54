"""Diagnose the multi-submap (outback) profile: per-frame synced wall
time attributed to stage, submap events, and per-frame trajectory error
— used to find where the p99 frame cost and the multi-submap ATE go.

    python tools/diag_outback.py --config configs/synthetic/outback.yaml
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic/outback.yaml")
    ap.add_argument("--out", default="/tmp/diag_outback.json")
    ap.add_argument("--warm", action="store_true",
                    help="run one untimed pass first (charge compiles)")
    args = ap.parse_args()

    import json

    import jax
    import numpy as np

    from mipsfusion_tpu.config import load_config
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = load_config(args.config)
    cfg["data"]["output"] = None
    n = cfg["synthetic"]["n_frames"]
    ds = SyntheticDataset(cfg, n_frames=n, trajectory="outback", span=1.0)
    for i in range(n):
        ds.packed(i)

    def frame0(i):
        return {"frame_id": i, "c2w": ds.gt_pose(i)}

    if args.warm:
        warm = MIPSFusionTPU(cfg, dataset=ds)
        for i in range(n):
            warm.process_frame(frame0(i), i)
        import jax as _jax
        _jax.block_until_ready(warm.state.est_c2w)
        del warm

    slam = MIPSFusionTPU(cfg, dataset=ds)
    events = []
    for name in ("active_submap_switch_new", "active_submap_switch",
                 "local_ba_switch", "do_local_ba", "inactive_refine_step",
                 "global_ba", "global_ba_consistency", "track",
                 "add_keyframe"):
        orig = getattr(slam, name)

        def spy(*a, _orig=orig, _name=name, **kw):
            t0 = time.perf_counter()
            r = _orig(*a, **kw)
            jax.block_until_ready(slam.state.est_c2w)
            events.append((_name, len(per_ms), time.perf_counter() - t0))
            return r

        setattr(slam, name, spy)

    mgr_orig = slam.manager.process_keyframe

    def mgr_spy(*a, **kw):
        t0 = time.perf_counter()
        r = mgr_orig(*a, **kw)
        jax.block_until_ready(slam.state.est_c2w)
        events.append(("manager", len(per_ms), time.perf_counter() - t0))
        return r

    slam.manager.process_keyframe = mgr_spy

    def frame(i):
        return {"frame_id": i, "c2w": ds.gt_pose(i)}

    per_ms = []
    slam.first_frame_mapping(frame(0), slam.mcfg.first_iters)
    per_ms.append(0.0)
    for i in range(1, n):
        t0 = time.perf_counter()
        slam.process_frame(frame(i), i)
        jax.block_until_ready(slam.state.est_c2w)
        per_ms.append((time.perf_counter() - t0) * 1e3)

    ate = slam.evaluate(n - 1)["absolute_translational_error.rmse"]

    # per-frame translation error of the assembled world trajectory
    est = slam.world_trajectory(n - 1)
    gt = np.stack([np.asarray(ds.gt_pose(i)) for i in range(n)])
    terr = np.linalg.norm(est[:, :3, 3] - gt[: est.shape[0], :3, 3], axis=1)

    per_ms = np.asarray(per_ms)
    by_frame = {}
    for name, fi, s in events:
        by_frame.setdefault(fi, []).append((name, round(s * 1e3, 1)))

    worst = np.argsort(per_ms)[::-1][:12]
    print(f"ATE RMSE: {float(ate)*1000:.1f} mm   n_frames={n}")
    print(f"p50={np.percentile(per_ms,50):.1f} ms  "
          f"p90={np.percentile(per_ms,90):.1f}  "
          f"p99={np.percentile(per_ms,99):.1f}  max={per_ms.max():.1f}")
    print("\nworst frames (stage breakdown, ms):")
    for fi in sorted(worst):
        print(f"  frame {fi:4d}  {per_ms[fi]:8.1f} ms   {by_frame.get(fi)}")
    print("\nper-frame translation error (every 10th):")
    for i in range(0, len(terr), 10):
        print(f"  {i:4d}: {terr[i]*1000:7.1f} mm")
    switches = [(nm, fi) for nm, fi, _ in events
                if nm.startswith("active_submap")]
    print("\nsubmap events:", switches)

    json.dump({"ate_m": float(ate), "per_ms": per_ms.tolist(),
               "terr_mm": (terr * 1e3).tolist(),
               "events": [(nm, fi, s) for nm, fi, s in events
                          if nm != "track" or s > 0.2]},
              open(args.out, "w"))


if __name__ == "__main__":
    main()
