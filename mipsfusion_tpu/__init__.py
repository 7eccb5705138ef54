"""MIPSFusion-TPU: a TPU-native online neural RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MIPSFusion
(yjtang249/MIPSFusion, SIGGRAPH Asia 2023): multi-implicit-submap neural
SLAM with hybrid (gradient + particle-swarm) tracking, submap lifecycle
management, loop closure with pose-graph optimization, and joint
marching-cubes mesh extraction.

Design stance (TPU-first, not a port):
  * The per-submap scene representation (multires hash grid + tiny MLP
    with a classification SDF head) is a pure-functional pytree; the
    whole sample->encode->decode->render->loss path is one jitted
    function differentiated with jax.grad.
  * All state lives in fixed-capacity device arrays with validity masks
    (no dynamic shapes, no retraces on the per-frame hot path).
  * Submaps are a stacked leading parameter axis [M, ...]; the
    reference's two-process shared-memory model handoff protocol
    becomes an index update.
  * Tracking (particle swarm + gradient descent) and bundle adjustment
    run as single jitted calls containing their full iteration loops
    (lax.fori_loop / lax.scan).
"""

__version__ = "0.1.0"
