"""A/B an encoding variant against the current flagship on the bench
scene: tracked FPS + ATE at both the fast and full budgets.

    python tools/ab_encoding.py --tri 32,64 --cp_components 40
    python tools/ab_encoding.py --tri 32,64,128 --cp_components 36  # base

Rationale: the one-hot plane contraction costs ~R^2*F FLOPs per point,
so the largest plane level dominates the fused kernel (BASELINE.md
kernel table); trading it for more CP-line components may hold ATE at a
fraction of the compute (the round-2 256^2 -> CP swap did).
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
    ap.add_argument("--tri", default="32,64")
    ap.add_argument("--cp_components", type=int, default=40)
    ap.add_argument("--cp_resolution", type=int, default=512)
    ap.add_argument("--config", default="configs/synthetic/orbit.yaml")
    ap.add_argument("--n", type=int, default=47)
    args = ap.parse_args()

    import jax
    from mipsfusion_tpu.config import load_config
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = load_config(args.config)
    cfg["data"]["output"] = None
    cfg["grid"]["tri_resolutions"] = [int(x) for x in args.tri.split(",")]
    cfg["grid"]["cp_components"] = args.cp_components
    cfg["grid"]["cp_resolution"] = args.cp_resolution

    n = args.n
    ds = SyntheticDataset(cfg, n_frames=n, trajectory="orbit",
                          span=n / 400.0)
    for i in range(n):
        ds.packed(i)
    slam = MIPSFusionTPU(cfg, dataset=ds)

    def frame(i):
        return {"frame_id": i, "c2w": ds.gt_pose(i)}

    warm = 16
    slam.first_frame_mapping(frame(0), slam.mcfg.first_iters)
    for i in range(1, warm + 1):
        slam.process_frame(frame(i), i)
    jax.block_until_ready(slam.state.est_c2w)
    t0 = time.perf_counter()
    for i in range(warm + 1, n):
        slam.process_frame(frame(i), i)
    jax.block_until_ready(slam.state.est_c2w)
    fps = (n - warm - 1) / (time.perf_counter() - t0)
    ate = slam.evaluate(n - 1)["absolute_translational_error.rmse"]
    print(f"tri={args.tri} cp={args.cp_components}x{args.cp_resolution}: "
          f"{fps:.2f} FPS, ATE {ate*1000:.2f} mm "
          f"({os.path.basename(args.config)})")


if __name__ == "__main__":
    main()
