"""Persistent XLA compilation cache, activated via jax.config.

Must go through ``jax.config.update``: the ``JAX_COMPILATION_CACHE_DIR``
env var is read once at jax-import time, which the axon sitecustomize
performs BEFORE any of our entry points run — so setting ``os.environ``
from bench/tool scripts silently did nothing and every process paid
full recompiles of every program (measured 3.8 s -> 0.09 s per program
across processes once active).

CPU (virtual-mesh tests/diagnostics) and TPU executables live in
separate directories so a platform switch never poisons the cache.
"""
import os


def enable_compile_cache() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu" \
            or jax.config.jax_platforms == "cpu":
        d = ".jax_cache_cpu"
    else:
        d = ".jax_cache"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
