"""Pallas <-> XLA equivalence of the fused field-query kernels.

Runs the kernels in interpret mode (MIPS_PALLAS_INTERPRET=1, set by
conftest import order below) so the test executes on CPU; on TPU the
same assertions hold for the compiled kernels (exercised by bench.py).
Covers: fused forward vs the f32 composite pipeline, the custom VJP's
parameter/coordinate gradients vs jax.grad of the composite, and the
transposed-layout entry.
"""

import os

os.environ["MIPS_PALLAS_INTERPRET"] = "1"  # must precede kernel import

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: ~3 min on CPU

from mipsfusion_tpu.models import scene_rep as sr
from mipsfusion_tpu.ops.field_pallas import (field_query_diff,
                                             field_query_pallas)


@pytest.fixture(scope="module")
def field():
    fcfg = sr.FieldConfig(
        enc="Triplane",
        tri=dataclasses.replace(sr.FieldConfig().tri,
                                resolutions=(16, 32), n_features=4,
                                cp_resolution=64, cp_components=24),
        freq=dataclasses.replace(sr.FieldConfig().freq, n_frequencies=8),
    )
    fcfg = dataclasses.replace(
        fcfg, decoder=dataclasses.replace(
            fcfg.decoder, input_ch=fcfg.tri.out_dim,
            input_ch_pos=fcfg.freq.out_dim + 3))
    params = sr.init_field_params(jax.random.PRNGKey(0), fcfg)
    # bring features to O(1): planes init at 1e-4, cp factors at 0.05
    # (their three-way product carries the magnitude)
    params["planes"] = {k: v * (1e4 if k.startswith("s") else 4.0)
                        for k, v in params["planes"].items()}
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3),
                           minval=0.05, maxval=0.95)
    return fcfg, params, x


def _composite(params, x, fcfg):
    return sr.query_color_sdf(params, x * fcfg.norm_factor, fcfg)


def test_forward_matches_composite(field):
    fcfg, params, x = field
    ref = np.asarray(_composite(params, x, fcfg))
    out = np.asarray(field_query_pallas(
        params, x, fcfg.tri.resolutions, fcfg.freq.n_frequencies,
        fcfg.decoder.n_class))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_transposed_entry_matches(field):
    fcfg, params, x = field
    a = np.asarray(field_query_pallas(
        params, x, fcfg.tri.resolutions, 8, 5, sdf_only=True))
    b = np.asarray(field_query_pallas(
        params, x.T, fcfg.tri.resolutions, 8, 5, sdf_only=True,
        x_transposed=True, return_transposed=True))
    np.testing.assert_allclose(a[:, 0], b[0], atol=1e-5)


def test_nondefault_decoder_widths(field):
    """Kernel width generalization: the fused fwd + VJP must track the
    composite for a decoder whose widths differ from the 128/128/64/64
    defaults (yaml `decoder.hidden_dim` etc., ref model/decoder.py:10-16
    knobs). Asymmetric n_sdf/n_rgb exercises every derived split."""
    fcfg0, _, x = field
    x = x[:256]
    fcfg = dataclasses.replace(
        fcfg0, decoder=dataclasses.replace(
            fcfg0.decoder, n_hidden=64, n_hidden_branch=64,
            n_hidden_sdf=48, n_hidden_rgb=32))
    params = sr.init_field_params(jax.random.PRNGKey(3), fcfg)
    params["planes"] = {k: v * (1e4 if k.startswith("s") else 4.0)
                        for k, v in params["planes"].items()}

    ref = np.asarray(_composite(params, x, fcfg))
    out = np.asarray(field_query_pallas(
        params, x, fcfg.tri.resolutions, fcfg.freq.n_frequencies,
        fcfg.decoder.n_class))
    np.testing.assert_allclose(out, ref, atol=5e-3)

    G = jax.random.normal(jax.random.PRNGKey(4), (256, 10)) * 0.1
    gc = jax.grad(lambda p, xx: jnp.sum(_composite(p, xx, fcfg) * G),
                  argnums=(0, 1))(params, x)
    gf = jax.grad(lambda p, xx: jnp.sum(field_query_diff(
        p, xx, fcfg.tri.resolutions, 8, 5) * G),
        argnums=(0, 1))(params, x)
    flat_c, _ = jax.flatten_util.ravel_pytree(gc[0])
    flat_f, _ = jax.flatten_util.ravel_pytree(gf[0])
    scale = float(jnp.abs(flat_c).max())
    assert float(jnp.abs(flat_c - flat_f).max()) < 0.03 * scale + 1e-4
    dx_scale = float(jnp.abs(gc[1]).max())
    assert float(jnp.abs(gc[1] - gf[1]).max()) < 0.05 * dx_scale + 1e-4


def test_vjp_matches_composite_grads(field):
    fcfg, params, x = field
    G = jax.random.normal(jax.random.PRNGKey(2), (512, 10)) * 0.1

    def loss_comp(p, xx):
        return jnp.sum(_composite(p, xx, fcfg) * G)

    def loss_fused(p, xx):
        return jnp.sum(field_query_diff(
            p, xx, fcfg.tri.resolutions, 8, 5) * G)

    gc = jax.grad(loss_comp, argnums=(0, 1))(params, x)
    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    flat_c, _ = jax.flatten_util.ravel_pytree(gc[0])
    flat_f, _ = jax.flatten_util.ravel_pytree(gf[0])
    scale = float(jnp.abs(flat_c).max())
    # bf16 matmuls inside the kernels: tolerance at bf16 resolution of
    # the gradient magnitudes
    assert float(jnp.abs(flat_c - flat_f).max()) < 0.03 * scale + 1e-4
    dx_scale = float(jnp.abs(gc[1]).max())
    assert float(jnp.abs(gc[1] - gf[1]).max()) < 0.05 * dx_scale + 1e-4
