"""A/B the outback pre-switch drift (frames 0-59) across budget
components, to attribute why the full-budget profile drifts MORE than
the fast profile before the first submap switch.

    python tools/ab_outback.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 60

FAST_TRACKING = {
    "tracking.iter": 8, "tracking.iter_RO": 4, "tracking.sample": 512,
    "tracking.RO.particle_size": 1024, "tracking.RO.n_rows": 12,
    "tracking.RO.n_cols": 16,
}
FAST_MAPPING = {
    "mapping.sample": 1024, "mapping.pixels_cur": 400,
    "mapping.iters": 8, "mapping.first_iters": 250,
}
FAST_Z = {"training.n_samples_d": 24, "training.n_range_d": 15}

VARIANTS = {
    "full": {},
    "full+fast_tracking": FAST_TRACKING,
    "full+fast_mapping": FAST_MAPPING,
    "full+fast_z": FAST_Z,
    "fast(all)": {**FAST_TRACKING, **FAST_MAPPING, **FAST_Z},
}


def run_variant(name, overrides):
    import jax
    import numpy as np

    from mipsfusion_tpu.config import apply_overrides, load_config
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = load_config("configs/synthetic/outback.yaml")
    cfg["data"]["output"] = None
    cfg = apply_overrides(cfg, overrides)
    n_total = cfg["synthetic"]["n_frames"]
    ds = SyntheticDataset(cfg, n_frames=n_total, trajectory="outback",
                          span=1.0)
    for i in range(N):
        ds.packed(i)

    slam = MIPSFusionTPU(cfg, dataset=ds)
    t0 = time.perf_counter()
    for i in range(N):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)
    jax.block_until_ready(slam.state.est_c2w)
    wall = time.perf_counter() - t0

    est = slam.world_trajectory(N - 1)
    gt = np.stack([np.asarray(ds.gt_pose(i)) for i in range(N)])
    terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1) * 1e3
    print(f"{name:<22s} terr@59 {terr[-1]:7.1f} mm   "
          f"mean[40:60] {terr[40:].mean():7.1f} mm   "
          f"max {terr.max():7.1f}   wall {wall:6.1f} s", flush=True)
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

def main():
    for name, ov in VARIANTS.items():
        run_variant(name, ov)


if __name__ == "__main__":
    main()
