"""Diagnose the sweep (fast-motion) seed lottery at full budgets.

The round-5 multi-seed stress A/B found the sweep scene diverging on
2/3 seeds EVEN AT the reference's full budgets (22.5 / 377.6 / 436.8 mm
— tools/ab_fullbudget.py --stress --seeds 3). This traces one run:
per-frame translation/rotation error vs GT, the tracking loss, and the
pose-gate accept bit, to locate the divergence onset and what the
tracker was doing there.

    python tools/diag_sweep.py --seed 1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--overrides", default="",
                    help="comma list k=v dotted config overrides")
    args = ap.parse_args()

    import jax
    import numpy as np

    from mipsfusion_tpu.config import apply_overrides, load_config
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = load_config("configs/synthetic/outback.yaml")
    cfg["data"]["output"] = None
    cfg["seed"] = args.seed
    cfg["synthetic"].update({"trajectory": "sweep", "n_frames": args.n})
    cfg["mapping"]["localMLP_max_len"] = [8.0, 8.0, 8.0]
    ov = {}
    for kv in args.overrides.split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
            ov[k] = v
    if ov:
        cfg = apply_overrides(cfg, ov)

    n = args.n
    ds = SyntheticDataset(cfg, n_frames=n, trajectory="sweep", span=1.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    for i in range(n):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)

    est = np.asarray(slam.state.est_c2w[:n])
    losses = [float(x) for x in slam.track_losses]
    drift = [float(x) for x in slam.track_drift] if slam.track_drift \
        else None
    resc = [bool(x) for x in slam.track_rescued] if slam.track_rescued \
        else None
    print("frame  terr_mm  rot_deg  loss" +
          ("  drift_mm resc" if drift else ""))
    worst = 0.0
    for i in range(n):
        gt = np.asarray(ds.gt_pose(i))
        terr = float(np.linalg.norm(est[i][:3, 3] - gt[:3, 3])) * 1e3
        R = est[i][:3, :3] @ gt[:3, :3].T
        cosang = np.clip((np.trace(R) - 1) / 2, -1, 1)
        rdeg = float(np.degrees(np.arccos(cosang)))
        worst = max(worst, terr)
        li = losses[i - 1] if 0 < i <= len(losses) else float("nan")
        flag = " <<<" if terr > 50 else ""
        extra = ""
        if drift and 0 < i <= len(drift):
            extra = f"  {drift[i-1]*1e3:8.1f} {'R' if resc[i-1] else '.'}"
        print(f"{i:5d}  {terr:7.1f}  {rdeg:7.2f}  {li:8.4f}{extra}{flag}")
    ate = slam.evaluate(n - 1)["absolute_translational_error.rmse"]
    print(f"\nseed {args.seed}: ATE {float(ate)*1e3:.1f} mm, "
          f"worst frame err {worst:.1f} mm")


if __name__ == "__main__":
    main()
