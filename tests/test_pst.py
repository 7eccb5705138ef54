"""The RO particle swarm template must be exactly mean-free.

The reference pre-samples the PST once and reuses it for every
iteration of every frame (ref RandomOptimizer.py:26-32); a raw draw
leaves a ~1/sqrt(P) sample-mean bias per axis that pushes the weighted
APS update in one fixed direction for the whole sequence (observed as
template-seed-dependent drift/divergence on the outback scene). The
antithetic construction removes it by design.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mipsfusion_tpu.slam.tracker import ROConfig, make_pst


def test_pst_zero_mean_and_identity_particle():
    for p in (1024, 2000, 999):
        cfg = ROConfig(particle_size=p)
        pst = make_pst(jax.random.PRNGKey(3), cfg)
        assert pst.shape == (p, 6)
        # particle 0 is the identity candidate (ref :31)
        np.testing.assert_array_equal(np.asarray(pst[0]), np.zeros(6))
        # exactly mean-free (antithetic pairs + inert identity rows)
        np.testing.assert_allclose(np.asarray(pst.sum(0)), np.zeros(6),
                                   atol=1e-4)
        # clamp preserved
        assert float(jnp.abs(pst).max()) <= 2.0
        # still a real spread (not degenerate)
        assert float(pst.std()) > 0.5
