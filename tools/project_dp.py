"""Measured DP-tracking scaling projection (single real chip).

Multi-chip hardware is not reachable from this environment, but the DP
sharding is pure ray/particle data-parallelism (tracker.py RO fitness
[3, P*n] batch, GO rays, BA rays — tests/test_sharded_tracking.py
asserts the all-reduces), so an N-chip projection decomposes into two
measurable parts:

  1. per-chip compute = the SAME jitted stages timed at a 1/N ray
     shard on the one real chip (shapes via config overrides:
     RO pixel grid n_cols, tracking.sample, mapping.sample/pixels_cur);
  2. collective cost = ring all-reduce arithmetic on the actual
     payload bytes: RO reduces two [P] partials per iteration, GO a
     7-param pose grad, BA the full field-param grad pytree, over
     v5e ICI at ~45 GB/s/link (+2 us/hop latency), cost
     2*(N-1)/N * bytes / bw per all-reduce.

Prints per-N projected steady-frame ms and FPS. The dominant term is
(1) — measured, not modeled; (2) is <1 ms/frame for this model size
(the BA grad pytree is the only non-trivial payload).

    python tools/project_dp.py --config configs/synthetic/orbit.yaml
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

ICI_BW = 45e9        # bytes/s per ICI link direction (v5e, public spec)
ICI_LAT = 2e-6       # per-hop latency


def param_bytes(cfg_path):
    import jax
    import jax.numpy as jnp
    from mipsfusion_tpu.config import load_config
    from mipsfusion_tpu.models import scene_rep as sr

    cfg = load_config(cfg_path)
    fcfg = sr.FieldConfig.from_dict(cfg)
    params = sr.init_field_params(jax.random.PRNGKey(0), fcfg)
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(x.size * 4 for x in leaves))  # f32 grads


def all_reduce_s(nbytes, n):
    if n <= 1:
        return 0.0
    return 2.0 * (n - 1) / n * nbytes / ICI_BW + (n - 1) * ICI_LAT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic/orbit.yaml")
    ap.add_argument("--chips", default="1,2,4,8")
    args = ap.parse_args()

    from bench import stage_device_times
    from mipsfusion_tpu.config import load_config

    cfg = load_config(args.config)
    ro_cols = cfg["tracking"]["RO"]["n_cols"]
    go_rays = cfg["tracking"]["sample"]
    ba_s, ba_c = cfg["mapping"]["sample"], cfg["mapping"]["pixels_cur"]
    map_every = cfg["mapping"].get("map_every", 3)
    n_iter_ro = cfg["tracking"]["iter_RO"]
    n_iter_go = cfg["tracking"]["iter"]
    n_iter_ba = cfg["mapping"]["iters"]
    P = cfg["tracking"]["RO"]["particle_size"]
    pbytes = param_bytes(args.config)
    print(f"# field-param grad payload: {pbytes/1e6:.2f} MB", flush=True)

    chips = [int(c) for c in args.chips.split(",")]
    rows = {}
    for n in chips:
        ov = {}
        if n > 1:
            ov = {"tracking.RO.n_cols": max(1, ro_cols // n),
                  "tracking.sample": max(64, go_rays // n),
                  "mapping.sample": max(128, ba_s // n),
                  "mapping.pixels_cur": max(64, ba_c // n)}
        dev = stage_device_times(args.config, reps=20, overrides=ov)
        coll_ms = 1e3 * (
            n_iter_ro * all_reduce_s(P * 4 * 2, n)       # RO [P] partials
            + n_iter_go * all_reduce_s(64, n)            # GO pose grad
            + n_iter_ba * all_reduce_s(pbytes, n) / map_every)
        frame_ms = dev["track_ms"] + dev["ba_ms"] / map_every + coll_ms
        rows[n] = {"shard_ro_ms": dev["ro_ms"], "shard_go_ms": dev["go_ms"],
                   "shard_ba_ms": dev["ba_ms"],
                   "shard_track_ms": dev["track_ms"],
                   "collectives_ms": round(coll_ms, 3),
                   "projected_frame_ms": round(frame_ms, 2),
                   "projected_fps": round(1e3 / frame_ms, 2)}
        print(n, json.dumps(rows[n]), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
