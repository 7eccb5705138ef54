"""Pallas TPU kernels for the multiscale triplane encoding.

This is the flagship compute kernel replacing tiny-cuda-nn's fused
hash-grid encode (/root/reference/model/encodings.py:13-25) with a
TPU-native design. The XLA fallback (ops/encoding.py triplane_encode)
materializes [N, R, F] interpolation intermediates in HBM; these
kernels keep everything in VMEM:

  * each point-block grid step holds the scale's THREE planes (<= 3 MB
    at R=256, F=4) in VMEM, builds 2-sparse one-hot interpolation
    matrices on the VPU, and contracts them against the planes on the
    MXU — HBM traffic is just points in / features out;
  * the backward into the planes is the transposed one-hot matmul
    (a scatter on GPUs, a pure matmul here), accumulated across point
    blocks in the sequential TPU grid — race-free by construction;
  * the backward w.r.t. point coordinates (pose gradients in
    tracking/BA) reuses the same structure with the derivative one-hot
    (onehot(i0+1) - onehot(i0)) * (R - 1).

Layout notes: Mosaic cannot relayout minor-dim reshapes
([B, R, F] <-> [B, R*F]), so every tensor is built directly in its
final orientation with broadcasted_iota compares, and all point-indexed
data is points-minor ([.., B]) — no in-kernel reshape or transpose.
Matmuls run with bf16 inputs and f32 accumulation (full MXU rate).

Public entry ``triplane_encode_pallas`` loops scales and concatenates
features; jax.custom_vjp ties the three kernels together.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 1024      # points per kernel instance (fwd / plane-bwd)
BLOCK_N_UV = 512    # uv-backward holds more live intermediates

_CONTRACT_0 = (((0,), (0,)), ((), ()))   # contract dim0 x dim0
_CONTRACT_1 = (((1,), (1,)), ((), ()))   # contract dim1 x dim1
_MATMUL = (((1,), (0,)), ((), ()))       # plain matmul


def _onehotT(iota_rb, i0, w, dtype):
    """Transposed 2-sparse interp matrix [R, B]: (1-w) at row i0, w at
    row i0+1. i0, w are [1, B] rows."""
    d0 = (iota_rb == i0).astype(dtype)
    d1 = (iota_rb == i0 + 1).astype(dtype)
    return d0 * (1.0 - w).astype(dtype) + d1 * w.astype(dtype)


def _onehotT_diff(iota_rb, i0, dtype):
    return ((iota_rb == i0 + 1).astype(dtype)
            - (iota_rb == i0).astype(dtype))


def _s(RF: int, F: int, dtype):
    """Expand matrix S [RF, F]: S[r*F+f', f] = (f == f')."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (RF, F), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RF, F), 1)
    return (rows % F == cols).astype(dtype)


def _sT(F: int, RF: int, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (F, RF), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (F, RF), 1)
    return (cols % F == rows).astype(dtype)


# ---------------------------------------------------------------------------
# forward:  out^T [F, N] per scale (3 planes summed)
# ---------------------------------------------------------------------------

def _fwd_kernel(iu_ref, wu_ref, iv_ref, wv_ref, plane_ref, out_ref):
    R, RF = plane_ref.shape[1], plane_ref.shape[2]
    F = out_ref.shape[0]
    B = iu_ref.shape[1]

    iota_rb = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    iota_rfb = jax.lax.broadcasted_iota(jnp.int32, (RF, B), 0) // F
    ST = _sT(F, RF, jnp.bfloat16)

    acc = jnp.zeros((F, B), jnp.float32)
    for p in range(3):
        WuT = _onehotT(iota_rb, iu_ref[p:p + 1], wu_ref[p:p + 1],
                       jnp.bfloat16)                               # [R, B]
        WvT = _onehotT(iota_rfb, iv_ref[p:p + 1], wv_ref[p:p + 1],
                       jnp.bfloat16)                               # [RF, B]
        P = plane_ref[p]                                           # [R, RF] bf16
        AT = jax.lax.dot_general(P, WuT, _CONTRACT_0,
                                 preferred_element_type=jnp.float32)
        prod = (AT * WvT).astype(jnp.bfloat16)                     # [RF, B]
        acc = acc + jax.lax.dot_general(
            ST, prod, _MATMUL, preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _scale_forward(iu, wu, iv, wv, plane_flat, F: int) -> jnp.ndarray:
    """iu/wu/iv/wv [3, N]; plane_flat [3, R, R*F] -> out^T [F, N]."""
    _, N = iu.shape
    _, R, RF = plane_flat.shape
    n_blocks = N // BLOCK_N
    row = lambda i: (0, i)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, RF), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, BLOCK_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, N), jnp.float32),
    )(iu, wu, iv, wv, plane_flat)


# ---------------------------------------------------------------------------
# backward into the planes:  dP [3, R, R*F]
# ---------------------------------------------------------------------------

def _bwd_plane_kernel(iu_ref, wu_ref, iv_ref, wv_ref, g_ref, dp_ref):
    i = pl.program_id(0)
    R, RF = dp_ref.shape[1], dp_ref.shape[2]
    F = g_ref.shape[0]
    B = iu_ref.shape[1]

    iota_rb = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    iota_rfb = jax.lax.broadcasted_iota(jnp.int32, (RF, B), 0) // F
    S = _s(RF, F, jnp.bfloat16)
    g_exp = jax.lax.dot_general(S, g_ref[:].astype(jnp.bfloat16), _MATMUL,
                                preferred_element_type=jnp.float32)  # [RF, B]

    for p in range(3):
        WuT = _onehotT(iota_rb, iu_ref[p:p + 1], wu_ref[p:p + 1],
                       jnp.bfloat16)
        WvT = _onehotT(iota_rfb, iv_ref[p:p + 1], wv_ref[p:p + 1],
                       jnp.float32)
        MT = (WvT * g_exp).astype(jnp.bfloat16)                    # [RF, B]
        dP = jax.lax.dot_general(WuT, MT, _CONTRACT_1,
                                 preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _():
            dp_ref[p] = dP

        @pl.when(i != 0)
        def _():
            dp_ref[p] = dp_ref[p] + dP


def _scale_backward_plane(iu, wu, iv, wv, gT, R: int) -> jnp.ndarray:
    _, N = iu.shape
    F = gT.shape[0]
    RF = R * F
    n_blocks = N // BLOCK_N
    row = lambda i: (0, i)
    return pl.pallas_call(
        _bwd_plane_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, R, RF), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, R, RF), jnp.float32),
    )(iu, wu, iv, wv, gT)


# ---------------------------------------------------------------------------
# backward w.r.t. uv:  duv [3, 2, N]
# ---------------------------------------------------------------------------

def _bwd_uv_kernel(iu_ref, wu_ref, iv_ref, wv_ref, plane_ref, g_ref,
                   duv_ref):
    R, RF = plane_ref.shape[1], plane_ref.shape[2]
    F = g_ref.shape[0]
    B = iu_ref.shape[1]

    iota_rb = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    iota_rfb = jax.lax.broadcasted_iota(jnp.int32, (RF, B), 0) // F
    S = _s(RF, F, jnp.bfloat16)
    g_exp = jax.lax.dot_general(S, g_ref[:].astype(jnp.bfloat16), _MATMUL,
                                preferred_element_type=jnp.float32)  # [RF, B]
    scale = jnp.float32(R - 1)

    for p in range(3):
        iu, wu = iu_ref[p:p + 1], wu_ref[p:p + 1]
        iv, wv = iv_ref[p:p + 1], wv_ref[p:p + 1]
        WuT = _onehotT(iota_rb, iu, wu, jnp.bfloat16)
        DuT = _onehotT_diff(iota_rb, iu, jnp.bfloat16)
        WvT = _onehotT(iota_rfb, iv, wv, jnp.float32)
        DvT = _onehotT_diff(iota_rfb, iv, jnp.float32)
        P = plane_ref[p]

        AduT = jax.lax.dot_general(P, DuT, _CONTRACT_0,
                                   preferred_element_type=jnp.float32)
        du = jnp.sum(AduT * WvT * g_exp, axis=0, keepdims=True)    # [1, B]
        AT = jax.lax.dot_general(P, WuT, _CONTRACT_0,
                                 preferred_element_type=jnp.float32)
        dv = jnp.sum(AT * DvT * g_exp, axis=0, keepdims=True)      # [1, B]
        duv_ref[p] = jnp.concatenate([du * scale, dv * scale], axis=0)


def _scale_backward_uv(iu, wu, iv, wv, plane_flat, gT) -> jnp.ndarray:
    _, N = iu.shape
    _, R, RF = plane_flat.shape
    F = RF // R
    n_blocks = N // BLOCK_N_UV
    row = lambda i: (0, i)
    return pl.pallas_call(
        _bwd_uv_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, BLOCK_N_UV), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N_UV), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N_UV), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_N_UV), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, RF), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, BLOCK_N_UV), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 2, BLOCK_N_UV), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 2, N), jnp.float32),
    )(iu, wu, iv, wv, plane_flat, gT)


# ---------------------------------------------------------------------------
# public entry with custom VJP
# ---------------------------------------------------------------------------

def _interp_coords(x: jnp.ndarray, R: int):
    """Per-plane (iu, wu, iv, wv) [3, N]: planes sample (xy, xz, yz)."""
    u = jnp.stack([x[:, 0], x[:, 0], x[:, 1]], axis=0)   # [3, N]
    v = jnp.stack([x[:, 1], x[:, 2], x[:, 2]], axis=0)
    pu = jnp.clip(u * (R - 1), 0.0, R - 1 - 1e-6)
    pv = jnp.clip(v * (R - 1), 0.0, R - 1 - 1e-6)
    iu = jnp.floor(pu)
    iv = jnp.floor(pv)
    return (iu.astype(jnp.int32), pu - iu,
            iv.astype(jnp.int32), pv - iv)


def _pad_n(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    N = x.shape[0]
    pad = (-N) % BLOCK_N
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, N


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def triplane_encode_pallas(planes: Dict[str, jnp.ndarray], x: jnp.ndarray,
                           resolutions: Tuple[int, ...]) -> jnp.ndarray:
    """Encode x [N,3] in [0,1]^3 -> [N, S*F] via Pallas kernels.

    planes: {"s<i>": [3, R_i, R_i, F]}. Drop-in replacement for
    ops.encoding.triplane_encode (same math, VMEM-resident execution).
    """
    out, _ = _fwd_impl(planes, x, resolutions)
    return out


def _fwd_impl(planes, x, resolutions):
    xp, N = _pad_n(x)
    outs = []
    for i, R in enumerate(resolutions):
        p = planes[f"s{i}"]
        F = p.shape[-1]
        iu, wu, iv, wv = _interp_coords(xp, R)
        outT = _scale_forward(
            iu, wu, iv, wv,
            p.reshape(3, R, R * F).astype(jnp.bfloat16), F)
        outs.append(outT)
    return jnp.concatenate(outs, axis=0).T[:N], (x,)


def _fwd_vjp(planes, x, resolutions):
    out, _ = _fwd_impl(planes, x, resolutions)
    return out, (planes, x)


def _bwd_vjp(resolutions, saved, g):
    planes, x = saved
    xp, N = _pad_n(x)
    Np = xp.shape[0]
    gp = jnp.pad(g, ((0, Np - N), (0, 0))) if Np != N else g

    F = planes["s0"].shape[-1]
    dplanes = {}
    dx = jnp.zeros_like(xp)
    for i, R in enumerate(resolutions):
        gT = gp[:, i * F:(i + 1) * F].T                   # [F, Np]
        iu, wu, iv, wv = _interp_coords(xp, R)
        dp_flat = _scale_backward_plane(iu, wu, iv, wv, gT, R)
        dplanes[f"s{i}"] = dp_flat.reshape(3, R, R, F)
        p_flat = planes[f"s{i}"].reshape(3, R, R * F).astype(jnp.bfloat16)
        duv = _scale_backward_uv(iu, wu, iv, wv, p_flat, gT)  # [3, 2, Np]
        # planes sample (u, v) = (xy, xz, yz): route back to x dims
        dx = dx.at[:, 0].add(duv[0, 0] + duv[1, 0])
        dx = dx.at[:, 1].add(duv[0, 1] + duv[2, 0])
        dx = dx.at[:, 2].add(duv[1, 1] + duv[2, 1])
    return dplanes, dx[:N]


triplane_encode_pallas.defvjp(_fwd_vjp, _bwd_vjp)
