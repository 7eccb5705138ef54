"""Fully-fused field query: triplane + frequency PE + decoder in one
Pallas TPU kernel.

The composite XLA path (triplane_encode_pallas -> frequency_encode ->
decoder_apply) round-trips every intermediate ([N,16] embed, [N,51] PE,
[N,128] activations) through HBM and pays per-op launch overhead; at
SLAM batch sizes (~50-200k points) that overhead dominates — the whole
query is ~100x off the memory-bound roofline. This kernel keeps every
intermediate in VMEM: per 1024-point block it

  * interpolates all triplane scales (same one-hot-matmul scheme as
    ops/triplane_pallas.py — MXU contractions, no gathers),
  * builds the NeRF frequency encoding on the VPU (sin/cos blocks; the
    interleaved tcnn layout is absorbed by pre-permuting the first
    decoder matrix's rows — see _prep_weights),
  * runs the 5-matmul decoder (/root/reference/model/decoder.py:53-75
    semantics: shared trunk, rgb branch, 5-class SDF classification
    head) with bf16 MXU inputs and f32 accumulation. Biases are folded
    into an extra weight row matched to a ones-row in each layer input
    (no in-kernel broadcasts or relayouts).

HBM traffic is points in / outputs out. Used on gradient-free paths
(RO particle fitness, ref RandomOptimizer.py:113-131; mesher grid
queries) via ``field_query_pallas``, and on the training paths (GO,
local BA, submap init) via ``field_query_diff`` — a custom VJP whose
backward pass is also hand-written Pallas (decoder-backward +
triplane/CP-backward kernels, below).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Interpret mode runs the kernels op-by-op on any backend (used by the
# CPU equivalence tests; set MIPS_PALLAS_INTERPRET=1)
import os as _os
_INTERPRET = bool(_os.environ.get("MIPS_PALLAS_INTERPRET"))

from .triplane_pallas import (BLOCK_N, _VTENT_MXU, _coords, _flat_planes,
                              _onehotT, _pad_n, _plane_tents, _sT)

# output row layout of the full query (matches decoder_apply's column
# layout: rgb(3), sdf(1), entropy(1), prob(n_class)); padded to 16 rows
OUT_ROWS = 16


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


# Profiling ablation knob (tools/profile_field.py): comma-separated
# subset of {planes, cp, pe, decoder} replaces that component with a
# near-free placeholder at TRACE time — no runtime cost when unset.
_STRIP = set((_os.environ.get("MIPS_KERNEL_STRIP") or "").split(","))

# A/B knob: accumulate the per-plane interpolation products in bf16
# instead of f32 in the forward kernel (halves the [RF, B] accumulator
# traffic; the MXU still accumulates each dot in f32 internally). The
# embed values lose ~8 mantissa bits pre-decoder; ATE impact must be
# re-validated before making this the default (tools/ab_encoding.py).
_BF16_PSUM = bool(_os.environ.get("MIPS_BF16_PSUM"))


def _freq_rows(krow, n_freq: int):
    """PE frequency constant 2^(k % J) * pi built from exponent bits:
    for integer j in [0, 127], float32(2^j) is (127 + j) << 23 — three
    integer VPU ops instead of a transcendental exp2."""
    j = krow % n_freq
    return jax.lax.bitcast_convert_type(
        (j + 127) << 23, jnp.float32) * np.float32(np.pi)


def _make_field_kernel(resolutions: Sequence[int], F: int, n_freq: int,
                       n_class: int, sdf_only: bool, has_cp: bool,
                       return_embed: bool = False, n_sdf: int = 64):
    S = len(resolutions)
    DF = 3 * n_freq                     # sin rows (= cos rows)
    # PE row layout (all 8-aligned blocks — Mosaic requires aligned
    # sublane concat operands): [x(3), ones(1), pad(4), sin(DF), cos(DF)]
    pe_rows = 8 + 2 * DF

    def kernel(*refs):
        xpad = refs[0][...]             # [8, B]: x(3), ones(1), zeros(4)
        xT_ref = xpad[0:3]
        plane_refs = refs[1:1 + S]      # [3, R, R*F] bf16 per scale
        o = 1 + S
        cp_ref = refs[o] if has_cp else None
        o += 1 if has_cp else 0
        w0_ref = refs[o]                # [pe_rows, 128] (bias folded)
        w1_ref = refs[o + 1]            # [128, 128] (bias separate)
        ws0_ref = refs[o + 2]           # [r8(64+embed+1), 128]
        ws1_ref = refs[o + 3]           # [128, 8] (bias separate)
        bias_ref = refs[o + 4]          # [128, 8] f32: col0=b1, col1=bs1
        wr_ref = refs[o + 5] if not sdf_only else None  # [64+pe_rows, 8]
        embed_out_ref = refs[-1] if return_embed else None
        out_ref = refs[-2] if return_embed else refs[-1]
        B = xT_ref.shape[1]
        f32 = jnp.float32

        ones8 = (jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) == 0
                 ).astype(f32)          # row 0 = 1, rows 1-7 = 0

        # ---- triplane features [S*F, B] --------------------------------
        embeds = []
        for si, R in enumerate(resolutions):
            if "planes" in _STRIP:
                embeds.append(jnp.zeros((F, B), f32) + xpad[0:1] * 0.01)
                continue
            RF = R * F
            iota_rb = jax.lax.broadcasted_iota(
                jnp.int32, (R, B), 0).astype(f32)
            iota_rfb = None if _VTENT_MXU else (

                jax.lax.broadcasted_iota(jnp.int32, (RF, B), 0)

                // F).astype(f32)
            ST = _sT(F, RF, jnp.bfloat16)
            acc_dt = jnp.bfloat16 if _BF16_PSUM else f32
            tents, _ = _plane_tents(xT_ref, iota_rb, iota_rfb, R,
                                    jnp.bfloat16, acc_dt, F=F)
            # sum the three plane products and run ONE fold matmul per
            # scale (3x fewer MXU passes than fold-per-plane)
            psum = jnp.zeros((RF, B), acc_dt)
            for p in range(3):
                WuT, WvT = tents[p]
                P = plane_refs[si][p]
                # Mosaic requires a 32-bit matmul accumulator; the bf16
                # A/B casts the RESULT so the psum chain runs in bf16
                AT = jax.lax.dot_general(
                    P, WuT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(acc_dt)
                psum = psum + AT * WvT
            embeds.append(jax.lax.dot_general(
                ST, psum.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=f32))
        if has_cp and "cp" in _STRIP:
            C_ = cp_ref.shape[2]
            embeds.append(jnp.zeros((C_, B), f32) + xpad[0:1] * 0.01)
        elif has_cp:
            Rcp = cp_ref.shape[1]
            iota_cp = jax.lax.broadcasted_iota(
                jnp.int32, (Rcp, B), 0).astype(f32)
            fs = []
            for a in range(3):
                pa = _coords(xT_ref[a:a + 1], Rcp)
                WT = _onehotT(iota_cp, pa, jnp.bfloat16)
                fs.append(jax.lax.dot_general(
                    cp_ref[a], WT, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32))     # [C, B]
            embeds.append(fs[0] * fs[1] * fs[2])
        embedT = jnp.concatenate(embeds, axis=0)     # [embed_dim, B]
        if return_embed:
            embed_out_ref[...] = embedT

        if "decoder" in _STRIP:
            out_ref[:] = jnp.broadcast_to(
                jnp.sum(embedT[:8], axis=0, keepdims=True), (out_ref.shape[0], B))
            return
        # ---- frequency PE: sin/cos blocks [DF, B] each ------------------
        # xrep[d*J + j] = x[d]; ang = xrep * 2^j * pi
        xrep = jnp.concatenate(
            [jnp.broadcast_to(xpad[d:d + 1], (n_freq, B))
             for d in range(3)], axis=0)             # [DF, B]
        krow = jax.lax.broadcasted_iota(jnp.int32, (DF, B), 0)
        freq = _freq_rows(krow, n_freq)
        ang = xrep * freq
        if "pe" in _STRIP:
            peT = jnp.concatenate(
                [xpad.astype(f32), ang, ang], axis=0)
        else:
            peT = jnp.concatenate(
                [xpad.astype(f32), jnp.sin(ang), jnp.cos(ang)], axis=0)
        # [pe_rows, B]; the ones (bias) row is xpad row 3

        def dense(wT_ref, x, relu):
            h = jax.lax.dot_general(
                wT_ref[...], x.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            return jnp.maximum(h, 0.0) if relu else h

        h0 = dense(w0_ref, peT[:w0_ref.shape[0]], True)   # [n_hidden, B]
        # biases via VPU broadcast-add: keeps K at the trunk width (a
        # bias-augmented operand pads to an extra MXU pass)
        h1 = dense(w1_ref, h0, False) + bias_ref[:w1_ref.shape[1], 0:1]
        sdf_emb = h1[:n_sdf]
        sdf_in = jnp.concatenate([sdf_emb, embedT, ones8], axis=0)
        h2 = dense(ws0_ref, sdf_in[:ws0_ref.shape[0]], True)
        logits = dense(ws1_ref, h2, False) + bias_ref[0:8, 1:2]

        crow = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
        cls_mask = crow < n_class
        lmax = jnp.max(jnp.where(cls_mask, logits, -jnp.inf), axis=0,
                       keepdims=True)
        ex = jnp.where(cls_mask, jnp.exp(logits - lmax), 0.0)
        prob = ex / jnp.sum(ex, axis=0, keepdims=True)   # [8, B]
        sdf = (jnp.sum(prob * crow.astype(f32), axis=0, keepdims=True)
               / (n_class - 1) - 0.5) * 2.0              # [1, B]

        if sdf_only:
            out_ref[:] = jnp.broadcast_to(sdf, (8, B))
            return

        rgb_emb = h1[n_sdf:]
        rgb_in = jnp.concatenate([rgb_emb, peT], axis=0)
        rgb = dense(wr_ref, rgb_in, False)               # rows >= 3 pad
        entropy = -jnp.sum(
            jnp.where(cls_mask, prob * jnp.log2(prob + 1e-5), 0.0),
            axis=0, keepdims=True)

        out_ref[0:3, :] = rgb[0:3]
        out_ref[3:4, :] = sdf
        out_ref[4:5, :] = entropy
        out_ref[5:5 + n_class, :] = prob[:n_class]
        out_ref[5 + n_class:, :] = jnp.zeros(
            (OUT_ROWS - 5 - n_class, B), f32)

    return kernel


def _decoder_dims(decoder: Dict, embed_dim: int) -> Tuple[int, int, int]:
    """(n_hidden_sdf, n_hidden_rgb, n_hidden_branch) from param shapes.

    All decoder widths must be multiples of 8 (Mosaic sublane-aligned
    slices/concats); init_decoder_params defaults satisfy this.
    """
    n_sdf = decoder["sdf0"]["w"].shape[0] - embed_dim
    n_rgb = decoder["trunk1"]["w"].shape[1] - n_sdf
    n_branch = decoder["sdf1"]["w"].shape[0]
    assert n_sdf % 8 == 0 and n_rgb % 8 == 0 and n_branch % 8 == 0, (
        n_sdf, n_rgb, n_branch)
    return n_sdf, n_rgb, n_branch


def _prep_weights(decoder: Dict, n_freq: int, embed_dim: int,
                  sdf_only: bool) -> Tuple[jnp.ndarray, ...]:
    """Transpose/pad/permute decoder params to the kernel layout.

    The kernel's PE row order is [x(3), sin(3*J), cos(3*J), 1] while
    decoder_apply consumes [x(3), (sin,cos) interleaved per dim/freq]
    (ops/encoding.py frequency_encode layout); the permutation and the
    bias row are folded into the input-side rows of each weight matrix.
    """
    DF = 3 * n_freq
    J = n_freq
    pe_rows = 8 + 2 * DF
    # perm[k] = original pe row feeding kernel row k (or -1 for none)
    perm = np.full(pe_rows, -1, np.int64)
    perm[:3] = np.arange(3)
    for d in range(3):
        for j in range(J):
            perm[8 + d * J + j] = 3 + d * 2 * J + 2 * j          # sin
            perm[8 + DF + d * J + j] = 3 + d * 2 * J + 2 * j + 1  # cos

    def expand_pe(w):
        """[3+2DF, out] -> [pe_rows, out] in kernel row order."""
        out = jnp.zeros((pe_rows, w.shape[1]), w.dtype)
        rows = np.where(perm >= 0)[0]
        return out.at[jnp.asarray(rows)].set(w[jnp.asarray(perm[rows])])

    # decoder widths, derived from the param shapes (DecoderConfig
    # n_hidden / n_hidden_sdf / n_hidden_rgb / n_hidden_branch knobs):
    n_sdf, n_rgb, n_branch = _decoder_dims(decoder, embed_dim)
    tr1_out = n_sdf + n_rgb

    # trunk0: permuted pe rows; bias at the ones row (index 3)
    w0 = expand_pe(decoder["trunk0"]["w"]).at[3].set(
        decoder["trunk0"]["b"])
    # trunk1 / sdf1: K kept at the hidden width; biases go in a
    # separate f32 ref (col 0 = trunk1 bias, col 1 rows 0..7 = sdf1
    # bias) and are broadcast-added on the VPU inside the kernel.
    w1 = decoder["trunk1"]["w"]
    # sdf0: input sdf_emb(n_sdf) + embed(embed_dim) + ones8
    s_in = n_sdf + embed_dim
    ws0 = jnp.zeros((_round8(s_in + 1), n_branch), w0.dtype) \
        .at[:s_in].set(decoder["sdf0"]["w"]) \
        .at[s_in].set(decoder["sdf0"]["b"])
    ws1 = jnp.zeros((n_branch, 8), w0.dtype) \
        .at[:n_branch, :decoder["sdf1"]["w"].shape[1]].set(
            decoder["sdf1"]["w"])
    bias_rows = max(tr1_out, 8)
    biases = jnp.zeros((bias_rows, 8), jnp.float32) \
        .at[:tr1_out, 0].set(decoder["trunk1"]["b"].astype(jnp.float32)) \
        .at[:decoder["sdf1"]["b"].shape[0], 1].set(
            decoder["sdf1"]["b"].astype(jnp.float32))
    out = [w0, w1, ws0, ws1]
    if not sdf_only:
        wr_full = decoder["rgb"]["w"]                 # [n_rgb+pe_dim, 3]
        wr = jnp.zeros((n_rgb + pe_rows, 8), w0.dtype) \
            .at[:n_rgb, :3].set(wr_full[:n_rgb]) \
            .at[n_rgb:, :3].set(expand_pe(wr_full[n_rgb:])) \
            .at[n_rgb + 3, :3].set(decoder["rgb"]["b"])
        out.append(wr)
    return tuple(w.astype(jnp.bfloat16) for w in out[:4]) + (biases,) \
        + tuple(w.astype(jnp.bfloat16) for w in out[4:])


@functools.partial(jax.jit, static_argnames=("resolutions", "n_freq",
                                             "n_class", "sdf_only",
                                             "return_embed",
                                             "x_transposed",
                                             "return_transposed"))
def field_query_pallas(params: Dict, x: jnp.ndarray,
                       resolutions: Tuple[int, ...], n_freq: int = 8,
                       n_class: int = 5, sdf_only: bool = False,
                       return_embed: bool = False,
                       x_transposed: bool = False,
                       return_transposed: bool = False):
    """Query normalized points x [N, 3] -> [N, 5+n_class] (or [N, 1] sdf).

    Drop-in fused equivalent of scene_rep.query_color_sdf for
    inference-only callers (same math, one kernel launch).
    """
    planes = params["planes"]
    F = planes["s0"].shape[-1]
    cp = planes.get("cp")
    embed_dim = len(resolutions) * F + (cp.shape[-1] if cp is not None
                                        else 0)
    weights = _prep_weights(params["decoder"], n_freq, embed_dim, sdf_only)
    n_sdf, _, _ = _decoder_dims(params["decoder"], embed_dim)

    assert n_freq % 8 == 0, "kernel assumes 8-aligned frequency count"
    if x_transposed:
        # x is [3, N] already points-minor: no relayout on entry
        N = x.shape[1]
        pad = (-N) % BLOCK_N
        xT = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        Nq = xT.shape[1]
    else:
        xp, N = _pad_n(x, BLOCK_N)
        xT = xp.T
        Nq = xp.shape[0]
    n_blocks = Nq // BLOCK_N
    # [8, Np]: x rows 0-2, ones row 3 (the folded bias input), zeros 4-7
    xpadT = jnp.concatenate(
        [xT, jnp.ones((1, Nq), xT.dtype),
         jnp.zeros((4, Nq), xT.dtype)], axis=0)

    in_specs = [pl.BlockSpec((8, BLOCK_N), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    args = [xpadT]
    for R in resolutions:
        in_specs.append(pl.BlockSpec((3, R, R * F), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    args += _flat_planes(planes, resolutions, F)
    if cp is not None:
        Rcp, C = cp.shape[1], cp.shape[2]
        in_specs.append(pl.BlockSpec((3, Rcp, C), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cp.astype(jnp.bfloat16))
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, s=w.shape: (0,) * len(s),
            memory_space=pltpu.VMEM))
        args.append(w)

    out_rows = 8 if sdf_only else OUT_ROWS
    out_specs = [pl.BlockSpec((out_rows, BLOCK_N), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((out_rows, Nq), jnp.float32)]
    if return_embed:
        assert embed_dim % 8 == 0, "embed rows must be 8-aligned"
        out_specs.append(pl.BlockSpec((embed_dim, BLOCK_N),
                                      lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((embed_dim, Nq),
                                               jnp.float32))
    outs = pl.pallas_call(
        _make_field_kernel(tuple(resolutions), F, n_freq, n_class,
                           sdf_only, cp is not None,
                           return_embed=return_embed, n_sdf=n_sdf),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if return_embed else out_specs[0],
        out_shape=tuple(out_shapes) if return_embed else out_shapes[0],
        interpret=_INTERPRET,
    )(*args)
    outT = outs[0] if return_embed else outs
    if return_transposed:
        res = outT[:1, :N] if sdf_only else outT[:5 + n_class, :N]
    else:
        res = outT.T[:N, :1] if sdf_only else outT.T[:N, :5 + n_class]
    if return_embed:
        return res, outs[1]
    return res




# ---------------------------------------------------------------------------
# differentiable fused query
# ---------------------------------------------------------------------------
#
# The training hot paths (GO tracking, local BA, submap init — ref
# mipsfusion.py:470-576, :259-370) need d(loss)/d(planes, decoder, x).
# jax.grad over the composite pipeline materializes every activation in
# HBM and pays per-op overhead twice; the fused VJP instead runs three
# kernels: (1) forward (saving the [embed_dim, N] triplane features as
# the only residual), (2) a decoder-backward kernel that rematerializes
# the PE+decoder forward in VMEM and emits d_embed, d_x(PE) and all
# decoder weight grads (accumulated across the sequential grid —
# race-free), and (3) the existing triplane backward kernels
# (ops/triplane_pallas.py) for d_planes and d_x(triplane).

def _make_decoder_bwd_kernel(F: int, n_freq: int, n_class: int,
                             embed_dim: int, n_sdf: int = 64,
                             n_rgb: int = 64):
    DF = 3 * n_freq
    J = n_freq
    s_in = n_sdf + embed_dim
    ws0_rows = _round8(s_in + 1)
    tr1_out = n_sdf + n_rgb
    bias_rows = max(tr1_out, 8)

    def kernel(xpad_ref, g_ref, embed_ref, w0_ref, w1_ref, ws0_ref,
               ws1_ref, bias_ref, wr_ref, dxpe_ref, dembed_ref, dw0_ref,
               dw1_ref, dws0_ref, dws1_ref, dbias_ref, dwr_ref):
        i = pl.program_id(0)
        xpad = xpad_ref[...]
        B = xpad.shape[1]
        f32 = jnp.float32
        bf16 = jnp.bfloat16
        ones8 = (jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) == 0
                 ).astype(f32)
        embedT = embed_ref[...]

        # ---------------- forward rematerialization ----------------------
        xrep = jnp.concatenate(
            [jnp.broadcast_to(xpad[d:d + 1], (J, B)) for d in range(3)],
            axis=0)
        krow = jax.lax.broadcasted_iota(jnp.int32, (DF, B), 0)
        freq = _freq_rows(krow, J)
        ang = xrep * freq
        sin_a, cos_a = jnp.sin(ang), jnp.cos(ang)
        peT = jnp.concatenate([xpad.astype(f32), sin_a, cos_a], axis=0)

        def dense(wT_ref, x, relu):
            h = jax.lax.dot_general(
                wT_ref[...], x.astype(bf16), (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            return jnp.maximum(h, 0.0) if relu else h

        h0 = dense(w0_ref, peT, True)
        h1 = dense(w1_ref, h0, False) + bias_ref[:w1_ref.shape[1], 0:1]
        sdf_emb, rgb_emb = h1[:n_sdf], h1[n_sdf:]
        sdf_in = jnp.concatenate([sdf_emb, embedT, ones8], axis=0)
        h2 = dense(ws0_ref, sdf_in[:ws0_rows], True)
        logits = dense(ws1_ref, h2, False) + bias_ref[0:8, 1:2]
        prob, _, crow, cls_mask = _softmax_head(logits, n_class, B)
        rgb_in = jnp.concatenate([rgb_emb, peT], axis=0)

        # ---------------- backward sweep ---------------------------------
        g = g_ref[...]                  # [16, B]; rows 5+n_class.. are 0
        g_sdf = g[3:4]
        g_ent = g[4:5]
        g_prob = jnp.where(cls_mask, g[5:13], 0.0)   # [8, B]

        ln2 = np.float32(np.log(2.0))
        eps = np.float32(1e-5)
        dent_dp = -(jnp.log2(prob + eps) + prob / ((prob + eps) * ln2))
        gp = (g_prob + g_sdf * (2.0 / (n_class - 1)) * crow.astype(f32)
              + g_ent * dent_dp)
        gp = jnp.where(cls_mask, gp, 0.0)
        dot = jnp.sum(gp * prob, axis=0, keepdims=True)
        d_logits = prob * (gp - dot)                  # [8, B]

        # rgb branch (rows 3.. of the 8-row slice hold sdf/ent grads ->
        # mask them out instead of a sub-8-row concat)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
        g_rgb8 = jnp.where(row8 < 3, g[0:8], 0.0)
        d_rgb_in = jax.lax.dot_general(
            wr_ref[...], g_rgb8.astype(bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)           # [n_rgb+pe_rows, B]
        dWr = jax.lax.dot_general(
            rgb_in.astype(bf16), g_rgb8.astype(bf16),
            (((1,), (1,)), ((), ())), preferred_element_type=f32)

        # sdf head (weights are bias-free [128, .] -> single MXU pass;
        # bias grads are VPU lane reductions)
        d_h2 = jax.lax.dot_general(
            ws1_ref[...], d_logits.astype(bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        dWs1 = jax.lax.dot_general(
            h2.astype(bf16), d_logits.astype(bf16),
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dbs1 = jnp.sum(d_logits, axis=1, keepdims=True)       # [8, 1]
        d_h2 = d_h2 * (h2 > 0.0)
        d_sdf_in = jax.lax.dot_general(
            ws0_ref[...], d_h2.astype(bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)               # [ws0_rows, B]
        dWs0 = jax.lax.dot_general(
            sdf_in[:ws0_rows].astype(bf16), d_h2.astype(bf16),
            (((1,), (1,)), ((), ())), preferred_element_type=f32)

        d_sdf_emb = d_sdf_in[:n_sdf]
        dembed_ref[...] = d_sdf_in[n_sdf:n_sdf + embed_dim]

        # trunk
        d_h1 = jnp.concatenate([d_sdf_emb, d_rgb_in[:n_rgb]], axis=0)
        d_h0 = jax.lax.dot_general(
            w1_ref[...], d_h1.astype(bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        dW1 = jax.lax.dot_general(
            h0.astype(bf16), d_h1.astype(bf16), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        db1 = jnp.sum(d_h1, axis=1, keepdims=True)        # [tr1_out, 1]
        d_h0 = d_h0 * (h0 > 0.0)
        d_pe = jax.lax.dot_general(
            w0_ref[...], d_h0.astype(bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)               # [pe_rows, B]
        dW0 = jax.lax.dot_general(
            peT.astype(bf16), d_h0.astype(bf16), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        d_pe = d_pe + d_rgb_in[n_rgb:]

        # PE chain -> d_x (the triplane d_x is added by the caller).
        # Group-sum the per-frequency angle grads with a one-hot matmul
        # (sub-8-row concats don't lower in Mosaic).
        d_sin = d_pe[8:8 + DF]
        d_cos = d_pe[8 + DF:8 + 2 * DF]
        d_ang = (d_sin * cos_a - d_cos * sin_a) * freq    # [DF, B]
        g_r = jax.lax.broadcasted_iota(jnp.int32, (8, DF), 0)
        g_k = jax.lax.broadcasted_iota(jnp.int32, (8, DF), 1)
        G8 = ((g_k // J == g_r) & (g_r < 3)).astype(f32)  # [8, DF]
        dx8 = jax.lax.dot_general(
            G8, d_ang, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                   # [8, B]
        dxpe_ref[...] = dx8 + jnp.where(row8 < 3, d_pe[0:8], 0.0)

        # bias grads packed like the bias input: col0=trunk1, col1=sdf1
        col8 = jax.lax.broadcasted_iota(jnp.int32, (bias_rows, 8), 1)
        db1_pad = db1 if bias_rows == tr1_out else jnp.concatenate(
            [db1, jnp.zeros((bias_rows - tr1_out, 1), f32)], axis=0)
        dbs1_pad = dbs1 if bias_rows == 8 else jnp.concatenate(
            [dbs1, jnp.zeros((bias_rows - 8, 1), f32)], axis=0)
        dbias = (jnp.where(col8 == 0, db1_pad, 0.0)
                 + jnp.where(col8 == 1, dbs1_pad, 0.0))

        for ref, val in ((dw0_ref, dW0), (dw1_ref, dW1), (dws0_ref, dWs0),
                         (dws1_ref, dWs1), (dbias_ref, dbias),
                         (dwr_ref, dWr)):
            @pl.when(i == 0)
            def _(ref=ref, val=val):
                ref[...] = val

            @pl.when(i != 0)
            def _(ref=ref, val=val):
                ref[...] = ref[...] + val

    return kernel


def _softmax_head(logits, n_class, B):
    crow = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
    cls_mask = crow < n_class
    lmax = jnp.max(jnp.where(cls_mask, logits, -jnp.inf), axis=0,
                   keepdims=True)
    ex = jnp.where(cls_mask, jnp.exp(logits - lmax), 0.0)
    prob = ex / jnp.sum(ex, axis=0, keepdims=True)
    sdf = (jnp.sum(prob * crow.astype(jnp.float32), axis=0, keepdims=True)
           / (n_class - 1) - 0.5) * 2.0
    return prob, sdf, crow, cls_mask


def _decoder_bwd_call(params: Dict, xpadT: jnp.ndarray, gT: jnp.ndarray,
                      embedT: jnp.ndarray, resolutions: Tuple[int, ...],
                      n_freq: int, n_class: int):
    """One launch of the decoder-backward kernel over padded [.., Np]."""
    planes = params["planes"]
    F = planes["s0"].shape[-1]
    cp = planes.get("cp")
    embed_dim = embedT.shape[0]
    weights = _prep_weights(params["decoder"], n_freq, embed_dim,
                            sdf_only=False)
    n_sdf, n_rgb, _ = _decoder_dims(params["decoder"], embed_dim)
    DF = 3 * n_freq
    pe_rows = 8 + 2 * DF
    s_in = n_sdf + embed_dim
    Np = xpadT.shape[1]
    n_blocks = Np // BLOCK_N

    in_specs = [
        pl.BlockSpec((8, BLOCK_N), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT_ROWS, BLOCK_N), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((embed_dim, BLOCK_N), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [xpadT, gT, embedT]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, s=w.shape: (0,) * len(s),
            memory_space=pltpu.VMEM))
        args.append(w)

    out_specs = [
        pl.BlockSpec((8, BLOCK_N), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((embed_dim, BLOCK_N), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((8, Np), jnp.float32),
        jax.ShapeDtypeStruct((embed_dim, Np), jnp.float32),
    ]
    # weight-grad outputs have exactly the prepped weights' shapes
    for w in weights:
        shape = tuple(w.shape)
        out_specs.append(pl.BlockSpec(shape, lambda i, s=shape: (0,) * 2,
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    outs = pl.pallas_call(
        _make_decoder_bwd_kernel(F, n_freq, n_class, embed_dim,
                                 n_sdf=n_sdf, n_rgb=n_rgb),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_INTERPRET,
    )(*args)
    dxpe, dembed = outs[0][:3], outs[1]
    dW0, dW1, dWs0, dWs1, dBias, dWr = outs[2:8]

    # map kernel-layout weight grads back to decoder param layout
    J = n_freq
    pe_dim = 3 + 2 * DF
    perm = np.full(pe_rows, -1, np.int64)
    perm[:3] = np.arange(3)
    for d in range(3):
        for j in range(J):
            perm[8 + d * J + j] = 3 + d * 2 * J + 2 * j
            perm[8 + DF + d * J + j] = 3 + d * 2 * J + 2 * j + 1
    inv = np.zeros(pe_dim, np.int64)
    for k, orig in enumerate(perm):
        if orig >= 0:
            inv[orig] = k
    inv_j = jnp.asarray(inv)

    n_out_sdf1 = params["decoder"]["sdf1"]["w"].shape[1]
    ddecoder = {
        "trunk0": {"w": dW0[inv_j], "b": dW0[3]},
        "trunk1": {"w": dW1, "b": dBias[:n_sdf + n_rgb, 0]},
        "sdf0": {"w": dWs0[:s_in], "b": dWs0[s_in]},
        "sdf1": {"w": dWs1[:, :n_out_sdf1], "b": dBias[:n_out_sdf1, 1]},
        "rgb": {"w": jnp.concatenate(
            [dWr[:n_rgb, :3], dWr[n_rgb:][inv_j][:, :3]], axis=0),
            "b": dWr[n_rgb + 3, :3]},
    }
    return dxpe, dembed, ddecoder


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def field_query_diff(params: Dict, x: jnp.ndarray,
                     resolutions: Tuple[int, ...], n_freq: int = 8,
                     n_class: int = 5) -> jnp.ndarray:
    """Differentiable fused field query [N,3] -> [N, 5+n_class].

    Forward = the fused kernel (saving the triplane features as the only
    residual); backward = decoder-bwd kernel + the triplane backward
    kernels. Gradients flow to the planes, the decoder params, and x
    (pose gradients).
    """
    out, _ = _fqd_fwd(params, x, resolutions, n_freq, n_class)
    return out


def _fqd_fwd(params, x, resolutions, n_freq, n_class):
    out, embedT = field_query_pallas(params, x, resolutions, n_freq,
                                     n_class, return_embed=True)
    return out, (params, x, embedT)


def _fqd_bwd(resolutions, n_freq, n_class, saved, g):
    from .triplane_pallas import _fused_backward_plane, _fused_backward_x

    params, x, embedT = saved
    planes = params["planes"]
    F = planes["s0"].shape[-1]
    cp = planes.get("cp")
    cp_bf = cp.astype(jnp.bfloat16) if cp is not None else None

    xp, N = _pad_n(x, BLOCK_N)
    Np = xp.shape[0]
    gp = jnp.pad(g, ((0, Np - N), (0, OUT_ROWS - g.shape[1])))
    xpadT = jnp.concatenate(
        [xp.T, jnp.ones((1, Np), xp.dtype), jnp.zeros((4, Np), xp.dtype)],
        axis=0)

    dxpe, dembedT, ddecoder = _decoder_bwd_call(
        params, xpadT, gp.T, embedT, resolutions, n_freq, n_class)

    xT = xpadT[0:3]
    dps = _fused_backward_plane(xT, dembedT, resolutions, F, cp_bf)
    dplanes = {f"s{i}": dp.reshape(3, R, R, F)
               for i, (R, dp) in enumerate(
                   zip(resolutions, dps[:len(resolutions)]))}
    if cp is not None:
        dplanes["cp"] = dps[len(resolutions)]

    from .triplane_pallas import BLOCK_N_UV
    xp2, _ = _pad_n(x, BLOCK_N_UV)
    Np2 = xp2.shape[0]
    dembed2 = dembedT[:, :Np2] if Np2 <= Np else jnp.pad(
        dembedT, ((0, 0), (0, Np2 - Np)))
    dxT_tri = _fused_backward_x(
        xp2.T, dembed2, _flat_planes(planes, resolutions, F),
        resolutions, F, cp_bf)
    dx = (dxpe.T[:N] + dxT_tri.T[:N]).astype(x.dtype)
    return {"planes": dplanes, "decoder": ddecoder}, dx


field_query_diff.defvjp(_fqd_fwd, _fqd_bwd)


# ---------------------------------------------------------------------------
# transposed differentiable fused query (points-minor end to end)
# ---------------------------------------------------------------------------
#
# field_query_diff takes x [N, 3] and returns [N, 10]: both layouts put
# the POINT axis on sublanes, so XLA inserts a lane<->sublane relayout
# on the way into the kernel (xp.T) and out of it (outT.T), and the
# same pair again for the cotangent in the backward. At [195k, 3] /
# [195k, 10] those tiles are 97/92% padding — the relayouts profile at
# a comparable cost to the kernel itself (BASELINE.md "training glue").
# Training callers that can build their ray points points-minor
# ([3, N], scene_rep.render_rays_T) use this variant instead: the
# kernel consumes and produces its native layout and the VJP never
# transposes anything.

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def field_query_diff_T(params: Dict, xT: jnp.ndarray,
                       resolutions: Tuple[int, ...], n_freq: int = 8,
                       n_class: int = 5) -> jnp.ndarray:
    """Differentiable fused field query, transposed: [3, N] -> [5+C, N].

    Same math and kernels as field_query_diff; row layout of the output
    matches decoder_apply's column layout (rgb 3, sdf, entropy, prob C).
    """
    out, _ = _fqdT_fwd(params, xT, resolutions, n_freq, n_class)
    return out


def _fqdT_fwd(params, xT, resolutions, n_freq, n_class):
    out, embedT = field_query_pallas(params, xT, resolutions, n_freq,
                                     n_class, return_embed=True,
                                     x_transposed=True,
                                     return_transposed=True)
    return out, (params, xT, embedT)


def _fqdT_bwd(resolutions, n_freq, n_class, saved, gT):
    from .triplane_pallas import (BLOCK_N_UV, _fused_backward_plane,
                                  _fused_backward_x)

    params, xT, embedT = saved
    planes = params["planes"]
    F = planes["s0"].shape[-1]
    cp = planes.get("cp")
    cp_bf = cp.astype(jnp.bfloat16) if cp is not None else None

    N = xT.shape[1]
    Np = embedT.shape[1]                  # already BLOCK_N-padded
    gp = jnp.pad(gT, ((0, OUT_ROWS - gT.shape[0]), (0, Np - N)))
    xp = jnp.pad(xT, ((0, 0), (0, Np - N))) if Np != N else xT
    xpadT = jnp.concatenate(
        [xp, jnp.ones((1, Np), xT.dtype), jnp.zeros((4, Np), xT.dtype)],
        axis=0)

    dxpe, dembedT, ddecoder = _decoder_bwd_call(
        params, xpadT, gp, embedT, resolutions, n_freq, n_class)

    dps = _fused_backward_plane(xp, dembedT, resolutions, F, cp_bf)
    dplanes = {f"s{i}": dp.reshape(3, R, R, F)
               for i, (R, dp) in enumerate(
                   zip(resolutions, dps[:len(resolutions)]))}
    if cp is not None:
        dplanes["cp"] = dps[len(resolutions)]

    # BLOCK_N is a multiple of BLOCK_N_UV, so the BLOCK_N-padded arrays
    # are valid inputs for the x-backward grid as-is
    assert Np % BLOCK_N_UV == 0
    dxT_tri = _fused_backward_x(
        xp, dembedT, _flat_planes(planes, resolutions, F),
        resolutions, F, cp_bf)
    dxT = (dxpe[:, :N] + dxT_tri[:, :N]).astype(xT.dtype)
    return {"planes": dplanes, "decoder": ddecoder}, dxT


field_query_diff_T.defvjp(_fqdT_fwd, _fqdT_bwd)
