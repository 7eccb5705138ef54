"""Pallas TPU kernels for the multiscale triplane encoding.

This is the flagship compute kernel replacing tiny-cuda-nn's fused
hash-grid encode (/root/reference/model/encodings.py:13-25) with a
TPU-native design. The XLA fallback (ops/encoding.py triplane_encode)
materializes [N, R, F] interpolation intermediates in HBM; these
kernels keep everything in VMEM and fuse ALL scales and planes into a
single launch per direction:

  * each point-block grid step holds every scale's three planes in VMEM
    (~4 MB total at (32,64,128,256) x F=4), builds 2-sparse one-hot
    interpolation matrices on the VPU, and contracts them against the
    planes on the MXU — HBM traffic is just points in / features out;
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

Public entry ``triplane_encode_pallas`` is a jax.custom_vjp drop-in for
the XLA version.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Interpret mode runs the kernels op-by-op on any backend (used by the
# CPU equivalence tests; set MIPS_PALLAS_INTERPRET=1)
import os as _os
_INTERPRET = bool(_os.environ.get("MIPS_PALLAS_INTERPRET"))

import os as _os
# points per kernel instance (fwd / plane-bwd); env-overridable for
# block-size tuning experiments (tools/ab_encoding.py workflow).
# v5e sweep on the 768k-pt fused fwd: 1024 = 4.10 ms / 2048 = 3.87 /
# 4096 = 3.80; 2048 gave +6% whole-system FPS at equal ATE and leaves
# VMEM headroom the marginal 4096 step does not.
BLOCK_N = int(_os.environ.get("MIPS_BLOCK_N", 2048))
BLOCK_N_UV = int(_os.environ.get("MIPS_BLOCK_N_UV", 512))


def _onehotT(iota_f, pu, dtype):
    """Transposed 2-sparse interp matrix [R, B] as a tent function:
    max(0, 1 - |r - pu|) is (1-frac) at row floor(pu), frac at the next
    row, 0 elsewhere — identical values to the compare-and-blend
    construction but 4 VPU ops per entry instead of 7 (the one-hot
    build is a measurable slice of the fused-kernel time; see the
    per-stage table in BASELINE.md). ``iota_f`` is a float32 row-index
    iota, ``pu`` the continuous (clipped) grid coordinate [1, B]."""
    return jnp.maximum(1.0 - jnp.abs(iota_f - pu), 0.0).astype(dtype)


def _onehotT_diff(iota_f, pu, dtype):
    """d/dpu of the interp matrix: -1 at row floor(pu), +1 at the next
    row (float equality on exact small integers is exact)."""
    i0 = jnp.floor(pu)
    return ((iota_f == i0 + 1.0).astype(dtype)
            - (iota_f == i0).astype(dtype))


def _s(RF: int, F: int, dtype):
    """Expand matrix S [RF, F]: S[r*F+f', f] = (f == f')."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (RF, F), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RF, F), 1)
    return (rows % F == cols).astype(dtype)


def _sT(F: int, RF: int, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (F, RF), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (F, RF), 1)
    return (cols % F == rows).astype(dtype)


# A/B knob: the [R*F, B] v-tents do F-fold redundant VPU work (every v
# row is repeated F times); MIPS_VTENT_MXU=1 builds the tent at [R, B]
# and expands it to [RF, B] with a constant 0/1 matmul on the MXU.
# MEASURED SLOWER on v5e (full-budget steady frame 58.5 vs 50.6 ms,
# 2026-08-19): the [RF, R] x [R, B] expansion runs at K=R=32/64, well
# under the 128-deep MXU's efficient contraction size, and costs more
# than the VPU ops it removes. Kept as a documented negative result —
# default OFF.
_VTENT_MXU = bool(_os.environ.get("MIPS_VTENT_MXU"))


def _expandF(RF: int, R: int, dtype):
    """Constant expansion matrix E [RF, R]: E[vF+f, v'] = (v == v')."""
    F = RF // R
    rows = jax.lax.broadcasted_iota(jnp.int32, (RF, R), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (RF, R), 1)
    return (rows // F == cols).astype(dtype)


def _vexpand(w_rb, RF: int, v_dtype):
    R = w_rb.shape[0]
    E = _expandF(RF, R, jnp.bfloat16)
    out = jax.lax.dot_general(E, w_rb.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(v_dtype)


def _plane_tents(xT_ref, iota_rb, iota_rfb, R: int, u_dtype, v_dtype,
                 F: int = None):
    """Per-plane (WuT, WvT) interp matrices for one scale, with shared
    tents hoisted: the planes sample (u, v) = (x,y), (x,z), (y,z), so
    only x and y are ever a u-coordinate and only y and z a
    v-coordinate — 2 tents at [R, B] + 2 at [R*F, B] instead of the 3+3
    a per-plane build would construct (the tent builds dominate the
    triplane VPU cost; see BASELINE.md). With _VTENT_MXU the v side is
    built at [R, B] and MXU-expanded (pass iota_rfb=None, F=F)."""
    px = _coords(xT_ref[0:1], R)
    py = _coords(xT_ref[1:2], R)
    pz = _coords(xT_ref[2:3], R)
    wx = _onehotT(iota_rb, px, u_dtype)
    wy = _onehotT(iota_rb, py, u_dtype)
    if iota_rfb is None:
        wz = _onehotT(iota_rb, pz, u_dtype)
        wyF = _vexpand(wy, R * F, v_dtype)
        wzF = _vexpand(wz, R * F, v_dtype)
    else:
        wyF = _onehotT(iota_rfb, py, v_dtype)
        wzF = _onehotT(iota_rfb, pz, v_dtype)
    return ((wx, wyF), (wx, wzF), (wy, wzF)), (px, py, pz)


def _plane_tents_diff(pcoords, iota_rb, iota_rfb, u_dtype, v_dtype,
                      F: int = None):
    """d/dcoord one-hots matching _plane_tents' plane order."""
    px, py, pz = pcoords
    dx = _onehotT_diff(iota_rb, px, u_dtype)
    dy = _onehotT_diff(iota_rb, py, u_dtype)
    if iota_rfb is None:
        R = dx.shape[0]
        dz = _onehotT_diff(iota_rb, pz, u_dtype)
        dyF = _vexpand(dy, R * F, v_dtype)
        dzF = _vexpand(dz, R * F, v_dtype)
    else:
        dyF = _onehotT_diff(iota_rfb, py, v_dtype)
        dzF = _onehotT_diff(iota_rfb, pz, v_dtype)
    return ((dx, dyF), (dx, dzF), (dy, dzF))


def _coords(u, R: int):
    """Continuous (clipped) grid coordinate pu [1, B] in f32."""
    return jnp.clip(u * (R - 1), 0.0, R - 1 - 1e-6)


# ---------------------------------------------------------------------------
# forward: out^T [S*F, N], all scales+planes in one kernel
# ---------------------------------------------------------------------------

def _make_fwd_kernel(resolutions: Sequence[int], F: int, has_cp: bool):
    S = len(resolutions)

    def kernel(*refs):
        xT_ref = refs[0]
        plane_refs = refs[1:1 + S]
        cp_ref = refs[1 + S] if has_cp else None
        out_ref = refs[-1]
        B = xT_ref.shape[1]

        for si, R in enumerate(resolutions):
            RF = R * F
            iota_rb = jax.lax.broadcasted_iota(
                jnp.int32, (R, B), 0).astype(jnp.float32)
            iota_rfb = None if _VTENT_MXU else (

                jax.lax.broadcasted_iota(jnp.int32, (RF, B), 0)

                // F).astype(jnp.float32)
            ST = _sT(F, RF, jnp.bfloat16)
            tents, _ = _plane_tents(xT_ref, iota_rb, iota_rfb, R,
                                    jnp.bfloat16, jnp.bfloat16, F=F)
            acc = jnp.zeros((F, B), jnp.float32)
            for p in range(3):
                WuT, WvT = tents[p]
                P = plane_refs[si][p]                        # [R, RF] bf16
                AT = jax.lax.dot_general(
                    P, WuT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [RF, B]
                prod = (AT * WvT).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    ST, prod, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[si * F:(si + 1) * F, :] = acc

        if has_cp:
            # CP term: elementwise product of three 1D line lookups
            Rcp, C = cp_ref.shape[1], cp_ref.shape[2]
            iota_cp = jax.lax.broadcasted_iota(
                jnp.int32, (Rcp, B), 0).astype(jnp.float32)
            fs = []
            for a in range(3):
                pa = _coords(xT_ref[a:a + 1], Rcp)
                WT = _onehotT(iota_cp, pa, jnp.bfloat16)
                fs.append(jax.lax.dot_general(
                    cp_ref[a], WT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # [C, B]
            out_ref[S * F:, :] = fs[0] * fs[1] * fs[2]

    return kernel


def _fused_forward(xT, planes_flat, resolutions, F, cp_lines=None):
    _, N = xT.shape
    S = len(resolutions)
    n_blocks = N // BLOCK_N
    in_specs = [pl.BlockSpec((3, BLOCK_N), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for R in resolutions:
        in_specs.append(pl.BlockSpec((3, R, R * F), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    args = [xT, *planes_flat]
    out_dim = S * F
    if cp_lines is not None:
        Rcp, C = cp_lines.shape[1], cp_lines.shape[2]
        in_specs.append(pl.BlockSpec((3, Rcp, C), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cp_lines)
        out_dim += C
    return pl.pallas_call(
        _make_fwd_kernel(tuple(resolutions), F, cp_lines is not None),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_dim, BLOCK_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_dim, N), jnp.float32),
        interpret=_INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# backward into the planes: one kernel, outputs dP per scale
# ---------------------------------------------------------------------------

def _make_bwd_plane_kernel(resolutions: Sequence[int], F: int,
                           has_cp: bool):
    S = len(resolutions)

    def kernel(*refs):
        xT_ref = refs[0]
        g_ref = refs[1]
        cp_ref = refs[2] if has_cp else None
        dp_refs = refs[(3 if has_cp else 2):(3 if has_cp else 2) + S]
        dcp_ref = refs[-1] if has_cp else None
        i = pl.program_id(0)
        B = xT_ref.shape[1]

        for si, R in enumerate(resolutions):
            RF = R * F
            iota_rb = jax.lax.broadcasted_iota(
                jnp.int32, (R, B), 0).astype(jnp.float32)
            iota_rfb = None if _VTENT_MXU else (

                jax.lax.broadcasted_iota(jnp.int32, (RF, B), 0)

                // F).astype(jnp.float32)
            Sx = _s(RF, F, jnp.bfloat16)
            gT = g_ref[si * F:(si + 1) * F, :].astype(jnp.bfloat16)
            g_exp = jax.lax.dot_general(
                Sx, gT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [RF, B]
            tents, _ = _plane_tents(xT_ref, iota_rb, iota_rfb, R,
                                    jnp.bfloat16, jnp.float32, F=F)
            for p in range(3):
                WuT, WvT = tents[p]
                MT = (WvT * g_exp).astype(jnp.bfloat16)      # [RF, B]
                dP = jax.lax.dot_general(
                    WuT, MT, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [R, RF]

                @pl.when(i == 0)
                def _():
                    dp_refs[si][p] = dP

                @pl.when(i != 0)
                def _():
                    dp_refs[si][p] = dp_refs[si][p] + dP

        if has_cp:
            Rcp, C = cp_ref.shape[1], cp_ref.shape[2]
            iota_cp = jax.lax.broadcasted_iota(
                jnp.int32, (Rcp, B), 0).astype(jnp.float32)
            g_cp = g_ref[S * F:, :]                          # [C, B]
            WTs, fs = [], []
            for a in range(3):
                pa = _coords(xT_ref[a:a + 1], Rcp)
                WT = _onehotT(iota_cp, pa, jnp.bfloat16)
                WTs.append(WT)
                fs.append(jax.lax.dot_general(
                    cp_ref[a], WT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # [C, B]
            others = [fs[1] * fs[2], fs[0] * fs[2], fs[0] * fs[1]]
            for a in range(3):
                dfa = (g_cp * others[a]).astype(jnp.bfloat16)  # [C, B]
                dL = jax.lax.dot_general(
                    WTs[a], dfa, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [Rcp, C]

                @pl.when(i == 0)
                def _():
                    dcp_ref[a] = dL

                @pl.when(i != 0)
                def _():
                    dcp_ref[a] = dcp_ref[a] + dL

    return kernel


def _fused_backward_plane(xT, gT, resolutions, F, cp_lines=None):
    _, N = xT.shape
    n_blocks = N // BLOCK_N
    S = len(resolutions)
    out_dim = S * F + (cp_lines.shape[2] if cp_lines is not None else 0)
    in_specs = [
        pl.BlockSpec((3, BLOCK_N), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((out_dim, BLOCK_N), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [xT, gT]
    if cp_lines is not None:
        Rcp, C = cp_lines.shape[1], cp_lines.shape[2]
        in_specs.append(pl.BlockSpec((3, Rcp, C), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cp_lines)
    out_specs = []
    out_shapes = []
    for R in resolutions:
        out_specs.append(pl.BlockSpec((3, R, R * F), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((3, R, R * F), jnp.float32))
    if cp_lines is not None:
        out_specs.append(pl.BlockSpec((3, Rcp, C), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((3, Rcp, C), jnp.float32))
    return pl.pallas_call(
        _make_bwd_plane_kernel(tuple(resolutions), F, cp_lines is not None),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# backward w.r.t. x: one kernel -> dxT [3, N]
# ---------------------------------------------------------------------------

def _make_bwd_x_kernel(resolutions: Sequence[int], F: int, has_cp: bool):
    S = len(resolutions)

    def kernel(*refs):
        xT_ref = refs[0]
        g_ref = refs[1]
        plane_refs = refs[2:2 + S]
        cp_ref = refs[2 + S] if has_cp else None
        dx_ref = refs[-1]
        B = xT_ref.shape[1]

        dx = jnp.zeros((1, B), jnp.float32)
        dy = jnp.zeros((1, B), jnp.float32)
        dz = jnp.zeros((1, B), jnp.float32)
        for si, R in enumerate(resolutions):
            RF = R * F
            iota_rb = jax.lax.broadcasted_iota(
                jnp.int32, (R, B), 0).astype(jnp.float32)
            iota_rfb = None if _VTENT_MXU else (

                jax.lax.broadcasted_iota(jnp.int32, (RF, B), 0)

                // F).astype(jnp.float32)
            Sx = _s(RF, F, jnp.bfloat16)
            gT = g_ref[si * F:(si + 1) * F, :].astype(jnp.bfloat16)
            g_exp = jax.lax.dot_general(
                Sx, gT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [RF, B]
            scale = jnp.float32(R - 1)
            tents, pcoords = _plane_tents(xT_ref, iota_rb, iota_rfb, R,
                                          jnp.bfloat16, jnp.float32, F=F)
            dtents = _plane_tents_diff(pcoords, iota_rb, iota_rfb,
                                       jnp.bfloat16, jnp.float32, F=F)
            for p in range(3):
                WuT, WvT = tents[p]
                DuT, DvT = dtents[p]
                P = plane_refs[si][p]

                AduT = jax.lax.dot_general(
                    P, DuT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                du = jnp.sum(AduT * WvT * g_exp, axis=0,
                             keepdims=True) * scale          # [1, B]
                AT = jax.lax.dot_general(
                    P, WuT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dv = jnp.sum(AT * DvT * g_exp, axis=0,
                             keepdims=True) * scale          # [1, B]
                # planes sample (u, v) = (xy, xz, yz)
                if p == 0:
                    dx = dx + du
                    dy = dy + dv
                elif p == 1:
                    dx = dx + du
                    dz = dz + dv
                else:
                    dy = dy + du
                    dz = dz + dv

        if has_cp:
            Rcp, C = cp_ref.shape[1], cp_ref.shape[2]
            iota_cp = jax.lax.broadcasted_iota(
                jnp.int32, (Rcp, B), 0).astype(jnp.float32)
            g_cp = g_ref[S * F:, :]                          # [C, B]
            fs, Ds = [], []
            for a in range(3):
                pa = _coords(xT_ref[a:a + 1], Rcp)
                WT = _onehotT(iota_cp, pa, jnp.bfloat16)
                DT = _onehotT_diff(iota_cp, pa, jnp.bfloat16)
                fs.append(jax.lax.dot_general(
                    cp_ref[a], WT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # [C, B]
                Ds.append(jax.lax.dot_general(
                    cp_ref[a], DT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # [C, B]
            others = [fs[1] * fs[2], fs[0] * fs[2], fs[0] * fs[1]]
            scale_cp = jnp.float32(Rcp - 1)
            da = [jnp.sum(g_cp * Ds[a] * others[a], axis=0,
                          keepdims=True) * scale_cp for a in range(3)]
            dx = dx + da[0]
            dy = dy + da[1]
            dz = dz + da[2]
        dx_ref[:] = jnp.concatenate([dx, dy, dz], axis=0)    # [3, B]

    return kernel


def _fused_backward_x(xT, gT, planes_flat, resolutions, F, cp_lines=None):
    _, N = xT.shape
    S = len(resolutions)
    n_blocks = N // BLOCK_N_UV
    out_dim = S * F + (cp_lines.shape[2] if cp_lines is not None else 0)
    in_specs = [
        pl.BlockSpec((3, BLOCK_N_UV), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((out_dim, BLOCK_N_UV), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    for R in resolutions:
        in_specs.append(pl.BlockSpec((3, R, R * F), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    args = [xT, gT, *planes_flat]
    if cp_lines is not None:
        Rcp, C = cp_lines.shape[1], cp_lines.shape[2]
        in_specs.append(pl.BlockSpec((3, Rcp, C), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cp_lines)
    return pl.pallas_call(
        _make_bwd_x_kernel(tuple(resolutions), F, cp_lines is not None),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, BLOCK_N_UV), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, N), jnp.float32),
        interpret=_INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# public entry with custom VJP
# ---------------------------------------------------------------------------

def _pad_n(x: jnp.ndarray, block: int) -> Tuple[jnp.ndarray, int]:
    N = x.shape[0]
    pad = (-N) % block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, N


def _flat_planes(planes, resolutions, F):
    return [planes[f"s{i}"].reshape(3, R, R * F).astype(jnp.bfloat16)
            for i, R in enumerate(resolutions)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def triplane_encode_pallas(planes: Dict[str, jnp.ndarray], x: jnp.ndarray,
                           resolutions: Tuple[int, ...]) -> jnp.ndarray:
    """Encode x [N,3] in [0,1]^3 -> [N, S*F] via fused Pallas kernels.

    planes: {"s<i>": [3, R_i, R_i, F]}. Drop-in replacement for
    ops.encoding.triplane_encode (same math, VMEM-resident execution).
    """
    out, _ = _fwd_impl(planes, x, resolutions)
    return out


def _cp_lines(planes):
    cp = planes.get("cp")
    return cp.astype(jnp.bfloat16) if cp is not None else None


def _fwd_impl(planes, x, resolutions):
    F = planes["s0"].shape[-1]
    xp, N = _pad_n(x, BLOCK_N)
    outT = _fused_forward(xp.T, _flat_planes(planes, resolutions, F),
                          resolutions, F, _cp_lines(planes))
    return outT.T[:N], (x,)


def _fwd_vjp(planes, x, resolutions):
    out, _ = _fwd_impl(planes, x, resolutions)
    return out, (planes, x)


def _bwd_vjp(resolutions, saved, g):
    planes, x = saved
    F = planes["s0"].shape[-1]

    cp = _cp_lines(planes)
    xp, N = _pad_n(x, BLOCK_N)
    gp = jnp.pad(g, ((0, xp.shape[0] - N), (0, 0))) \
        if xp.shape[0] != N else g
    dps = _fused_backward_plane(xp.T, gp.T, resolutions, F, cp)
    dplanes = {f"s{i}": dp.reshape(3, R, R, F)
               for i, (R, dp) in enumerate(
                   zip(resolutions, dps[:len(resolutions)]))}
    if cp is not None:
        dplanes["cp"] = dps[len(resolutions)]

    xp2, _ = _pad_n(x, BLOCK_N_UV)
    gp2 = jnp.pad(g, ((0, xp2.shape[0] - N), (0, 0))) \
        if xp2.shape[0] != N else g
    dxT = _fused_backward_x(xp2.T, gp2.T,
                            _flat_planes(planes, resolutions, F),
                            resolutions, F, cp)
    return dplanes, dxT.T[:N]


triplane_encode_pallas.defvjp(_fwd_vjp, _bwd_vjp)
