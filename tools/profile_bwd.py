"""Time the three kernels behind field_query_diff's VJP separately at
the local-BA batch size, to attribute the BA iteration cost (the BA
step is kernel-bound; see BASELINE.md per-stage table).

    python tools/profile_bwd.py                  # 195k pts (BA batch)
    python tools/profile_bwd.py --n_pts 75000    # GO batch
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic/orbit.yaml")
    ap.add_argument("--n_pts", type=int, default=2600 * 75)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mipsfusion_tpu.config import load_config
    from mipsfusion_tpu.models import scene_rep as sr
    from mipsfusion_tpu.ops import field_pallas as fp
    from mipsfusion_tpu.ops.triplane_pallas import (
        BLOCK_N, BLOCK_N_UV, _flat_planes, _fused_backward_plane,
        _fused_backward_x, _pad_n)

    cfg = load_config(args.config)
    fcfg = sr.FieldConfig.from_dict(cfg)
    fcfg = dataclasses.replace(
        fcfg, use_pallas=True,
        decoder=dataclasses.replace(fcfg.decoder, bf16=True))
    key = jax.random.PRNGKey(0)
    params = sr.init_field_params(key, fcfg)
    res = fcfg.tri.resolutions
    n_freq, n_class = fcfg.freq.n_frequencies, fcfg.decoder.n_class
    N = args.n_pts
    x = jax.random.uniform(key, (N, 3), minval=0.2, maxval=0.8)
    g = jax.random.normal(key, (N, 5 + n_class)) * 0.1
    reps = args.reps

    def timeit(name, fn):
        out = fn(0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for r in range(reps):
            out = fn(r)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:<34s} {ms:8.3f} ms")
        return ms

    @jax.jit
    def fwd(x):
        return fp.field_query_pallas(params, x, res, n_freq, n_class,
                                     return_embed=True)

    out, embedT = fwd(x)
    xp, _ = _pad_n(x, BLOCK_N)
    Np = xp.shape[0]
    gp = jnp.pad(g, ((0, Np - N), (0, fp.OUT_ROWS - g.shape[1])))
    xpadT = jnp.concatenate(
        [xp.T, jnp.ones((1, Np), xp.dtype), jnp.zeros((4, Np), xp.dtype)],
        axis=0)
    gT = gp.T
    planes = params["planes"]
    F = planes["s0"].shape[-1]
    cp_bf = planes["cp"].astype(jnp.bfloat16) if "cp" in planes else None
    xp2, _ = _pad_n(x, BLOCK_N_UV)
    Np2 = xp2.shape[0]

    dec_bwd = jax.jit(lambda xpadT, gT, embedT: fp._decoder_bwd_call(
        params, xpadT, gT, embedT, tuple(res), n_freq, n_class))
    plane_bwd = jax.jit(lambda xT, dembedT: _fused_backward_plane(
        xT, dembedT, tuple(res), F, cp_bf))

    def x_bwd_fn(xT2, dembed2):
        return _fused_backward_x(xT2, dembed2,
                                 _flat_planes(planes, tuple(res), F),
                                 tuple(res), F, cp_bf)
    x_bwd = jax.jit(x_bwd_fn)

    dxpe, dembedT, _ = dec_bwd(xpadT, gT, embedT)
    dembed2 = dembedT[:, :Np2] if Np2 <= Np else jnp.pad(
        dembedT, ((0, 0), (0, Np2 - Np)))
    dembed2 = jax.block_until_ready(dembed2)

    print(f"backend={jax.default_backend()}  N={N}")
    t_f = timeit("forward (full, +embed residual)",
                 lambda r: fwd(x + 1e-6 * r))
    t_d = timeit("decoder bwd", lambda r: dec_bwd(xpadT, gT, embedT))
    t_p = timeit("plane/CP bwd", lambda r: plane_bwd(xpadT[0:3], dembedT))
    t_x = timeit("x bwd", lambda r: x_bwd(xp2.T, dembed2))
    print("-" * 46)
    print(f"{'sum (≈ one BA-iter field cost)':<34s} "
          f"{t_f + t_d + t_p + t_x:8.3f} ms")


if __name__ == "__main__":
    main()
