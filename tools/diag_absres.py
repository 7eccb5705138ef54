"""Validate an ABSOLUTE map-anchored tracking-error signal on the
fast-motion seed lottery.

The round-5 multi-seed study (BASELINE.md) traced full-budget sweep
divergence to a gradual basin slide that every EWMA-RELATIVE gate
absorbs (the "boiling frog": each frame's loss stays within ~2x of the
accepted-loss EWMA while the pose error compounds). The candidate
absolute signal is the median |SDF| of the depth image back-projected at
the estimated pose, in METERS (x trunc): at a correct pose on a trained
map, surface points sit at SDF ~ 0 regardless of scene content or loss
regime; a slipped pose moves EVERY back-projected point off the zero
set by ~ the pose error. Unlike the loss EWMA it cannot be dragged
along by the slide, because the map's zero set is anchored by the
(mostly healthy) keyframe history, not by the current frame.

This traces one run per seed: per-frame GT translation error vs the
median/mean |SDF| residual measured with the LIVE params right after
the frame was tracked — the separation (healthy frames ~ mm, sliding
frames ~ pose error) is what the tracking.rescue gate keys on.

    python tools/diag_absres.py --seed 1
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
    ap.add_argument("--trajectory", default="sweep")
    ap.add_argument("--overrides", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mipsfusion_tpu.config import apply_overrides, load_config
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.models import scene_rep as sr
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = load_config("configs/synthetic/outback.yaml")
    cfg["data"]["output"] = None
    cfg["seed"] = args.seed
    cfg["synthetic"].update({"trajectory": args.trajectory,
                             "n_frames": args.n})
    if args.trajectory == "sweep":
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
    ds = SyntheticDataset(cfg, n_frames=n, trajectory=args.trajectory,
                          span=1.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    fcfg = slam.fcfg_track

    @jax.jit
    def absres(params, packed, pose):
        # strided 16x24 surface grid, the same family as RO's fitness
        H, W = packed.shape[:2]
        rr = jnp.linspace(0, H - 1, 16).astype(jnp.int32)
        cc = jnp.linspace(0, W - 1, 24).astype(jnp.int32)
        r, c = jnp.meshgrid(rr, cc, indexing="ij")
        r, c = r.reshape(-1), c.reshape(-1)
        d = packed[r, c, 6][:, None]
        dirs = packed[r, c, :3]
        pts_cam = dirs * d
        world = (pose[:3, :3] @ pts_cam.T + pose[:3, 3:4])        # [3,n]
        sdf = sr.run_network_sdf_T(params, world, fcfg, slam.consts)
        am = jnp.abs(sdf) * fcfg.trunc
        am = jnp.where(d[:, 0] > 0.0, am, jnp.nan)
        return jnp.nanmedian(am), jnp.nanmean(am)

    print("frame  terr_mm  med_absres_mm  mean_absres_mm  loss")
    meds, terrs = [], []
    for i in range(n):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)
        packed = ds.packed(i)
        pose = slam.state.est_c2w[i]
        med, mean = absres(slam.submap_params[slam.active_id], packed,
                           pose)
        gt = np.asarray(ds.gt_pose(i))
        gt0 = np.asarray(ds.gt_pose(0))
        est = np.asarray(pose)
        # est is submap-local (frame0 = I on the sweep's single submap)
        gt_local = np.linalg.inv(gt0) @ gt
        terr = float(np.linalg.norm(est[:3, 3] - gt_local[:3, 3])) * 1e3
        li = float(slam.track_losses[-1]) if slam.track_losses \
            else float("nan")
        med, mean = float(med) * 1e3, float(mean) * 1e3
        meds.append(med)
        terrs.append(terr)
        flag = " <<<" if terr > 50 else ""
        print(f"{i:5d}  {terr:7.1f}  {med:10.1f}  {mean:10.1f}  "
              f"{li:8.4f}{flag}", flush=True)

    meds, terrs = np.asarray(meds), np.asarray(terrs)
    healthy = terrs < 30.0
    print(f"\nseed {args.seed}: median absres on healthy frames "
          f"(terr<30mm): {np.median(meds[healthy]):.1f} mm "
          f"(p95 {np.percentile(meds[healthy], 95):.1f}); "
          f"on bad frames: "
          f"{np.median(meds[~healthy]) if (~healthy).any() else float('nan'):.1f} mm")
    ate = slam.evaluate(n - 1)["absolute_translational_error.rmse"]
    print(f"ATE {float(ate)*1e3:.1f} mm")


if __name__ == "__main__":
    main()
