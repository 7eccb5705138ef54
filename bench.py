"""Benchmark: steady-state tracked FPS of the full SLAM loop on TPU.

Times ``process_frame`` (tracking RO+GO, local BA at mapping cadence,
keyframe insertion AND the manager's decision pipeline) on a synthetic
RGB-D sequence rendered on device, then reports frames per second of
wall clock for TWO budgets:

  * the validated fast profile (configs/synthetic/orbit_fast.yaml:
    4 RO iters x 1024 particles x 192 px; 8 GO iters x 512 rays x 39
    z-samples; BA every 3 frames, 8 iters x 1424 rays) — ATE-validated
    against the full-budget run on this scene (BASELINE.md);
  * the reference's compute budgets (configs/synthetic/orbit.yaml:
    5 RO iters x 2000 particles x 384 px; 10 GO iters x 1000 rays x 75
    z-samples; BA every 3 frames, 15 iters x 2600 rays — matching
    /root/reference/configs/FastCaMo-synth/FastCaMo-synth.yaml budgets).

Prints ONE JSON line. "value" is the fast-profile FPS (the operating
point); "full_budget_fps" rides along. vs_baseline is value / 30 fps
(the north-star target in BASELINE.json — the reference publishes no
numbers of its own).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax  # noqa: E402

from mipsfusion_tpu.config import load_config  # noqa: E402
from mipsfusion_tpu.datasets.synthetic import SyntheticDataset  # noqa: E402
from mipsfusion_tpu.slam.system import MIPSFusionTPU  # noqa: E402

N_WARM = 16     # a full keyframe cycle: covers every jit shape
                # (track, BA, keyframe add, manager predicates)
N_BENCH = 30    # timed steady-state frames


def run_profile(cfg_path: str):
    cfg = load_config(cfg_path)
    cfg["data"]["output"] = None
    n_frames = N_WARM + N_BENCH + 1
    ds = SyntheticDataset(cfg, n_frames=n_frames, trajectory="orbit",
                          span=n_frames / 400.0)
    # pre-render all frames on device so data generation is off the clock
    for i in range(n_frames):
        ds.packed(i)

    slam = MIPSFusionTPU(cfg, dataset=ds)

    def frame(i):
        return {"frame_id": i, "c2w": ds.gt_pose(i)}

    slam.first_frame_mapping(frame(0), slam.mcfg.first_iters)
    for i in range(1, N_WARM + 1):
        slam.process_frame(frame(i), i)
    jax.block_until_ready(slam.state.est_c2w)

    t0 = time.perf_counter()
    for i in range(N_WARM + 1, N_WARM + 1 + N_BENCH):
        slam.process_frame(frame(i), i)
    jax.block_until_ready(slam.state.est_c2w)
    fps = N_BENCH / (time.perf_counter() - t0)

    ate = slam.evaluate(N_WARM + N_BENCH)[
        "absolute_translational_error.rmse"]
    return fps, ate


def main():
    fast_fps, fast_ate = run_profile("configs/synthetic/orbit_fast.yaml")
    full_fps, full_ate = run_profile("configs/synthetic/orbit.yaml")
    print(json.dumps({
        "metric": "tracked_fps",
        "value": round(fast_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fast_fps / 30.0, 4),
        "config": "configs/synthetic/orbit_fast.yaml (ATE-validated "
                  "fast profile; process_frame incl. manager)",
        "ate_rmse_m": round(fast_ate, 5),
        "full_budget_fps": round(full_fps, 3),
        "full_budget_ate_rmse_m": round(full_ate, 5),
    }))


if __name__ == "__main__":
    main()
