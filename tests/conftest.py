"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py on hardware.

Note: the environment's sitecustomize registers the TPU backend
programmatically, which overrides the JAX_PLATFORMS env var — so we force
the CPU platform via jax.config, which wins over the registered backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# big scan bodies (track/BA) take minutes to compile on CPU; cache them
# across runs so the default suite is fast after the first execution.
# NOTE: must go through jax.config (the axon sitecustomize imports jax
# before conftest runs, so the env var is read too early to matter).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
