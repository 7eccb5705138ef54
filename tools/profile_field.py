"""Component-level cost attribution for the fused field-query kernel.

The fused Pallas kernel (`ops/field_pallas.py`) computes triplane
encode + CP-line encode + frequency PE + SDF decoder in one launch, so
XLA-level profilers see it as a single opaque op.  This tool attributes
its cost by ablation: the kernel honors `MIPS_KERNEL_STRIP` (a
comma-separated subset of {planes, cp, pe, decoder}) which replaces the
named component with a near-free placeholder at trace time — zero cost
when unset.  Timing the stripped variants and differencing gives the
per-component device time.

    python tools/profile_field.py                 # full sweep
    python tools/profile_field.py --strip planes  # one variant

Measured on TPU (768k pts, SDF-only query, 2026-08-17): total 4.19 ms
= planes 1.68 + CP 0.95 + PE 0.67 + decoder 1.24 ms (+ overlap/shell).
"""

import argparse
import dataclasses
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP = ["", "planes", "cp", "pe", "decoder"]


def measure(n_pts: int, reps: int, config: str) -> float:
    import jax
    import jax.numpy as jnp
    from mipsfusion_tpu.config import load_config
    from mipsfusion_tpu.models import scene_rep as sr

    cfg = load_config(config)
    fcfg = sr.FieldConfig.from_dict(cfg)
    fcfg = dataclasses.replace(
        fcfg, use_pallas=True,
        decoder=dataclasses.replace(fcfg.decoder, bf16=True))
    key = jax.random.PRNGKey(0)
    params = sr.init_field_params(key, fcfg)
    consts = sr.FieldConsts(jnp.zeros(3), jnp.ones(3) * 0.2)
    pts = jax.random.uniform(key, (3, n_pts), minval=0.2, maxval=0.8)

    @jax.jit
    def bare(x):
        def b(i, acc):
            s = sr.run_network_sdf_T(params, x + 1e-6 * i, fcfg, consts)
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, reps, b, 0.0)

    jax.block_until_ready(bare(pts))
    t0 = time.perf_counter()
    jax.block_until_ready(bare(pts))
    return (time.perf_counter() - t0) / reps * 1e3
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic/orbit.yaml")
    ap.add_argument("--n_pts", type=int, default=768 * 1024)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--strip", default=None,
                    help="run ONE variant in-process (used by the sweep)")
    args = ap.parse_args()

    if args.strip is not None:
        os.environ["MIPS_KERNEL_STRIP"] = args.strip
        ms = measure(args.n_pts, args.reps, args.config)
        print(f"strip='{args.strip}' {ms:7.3f} ms")
        return

    # each variant is a fresh process: the strip set is baked in at
    # import/trace time and jit caches would otherwise go stale
    rows = {}
    for s in SWEEP:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--strip", s,
             "--n_pts", str(args.n_pts), "--reps", str(args.reps),
             "--config", args.config],
            capture_output=True, text=True)
        line = [ln for ln in out.stdout.splitlines() if "strip=" in ln]
        print(line[-1] if line else f"strip='{s}' FAILED\n{out.stderr[-500:]}")
        if line:
            rows[s] = float(line[-1].split()[-2])
    if "" in rows:
        total = rows[""]
        print(f"\ntotal {total:.3f} ms; attributed component cost:")
        for s in SWEEP[1:]:
            if s in rows:
                print(f"  {s:8s} {total - rows[s]:6.3f} ms")


if __name__ == "__main__":
    main()
