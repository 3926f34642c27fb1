"""Persistent-compile-cache setup — a leaf module so the lightweight
CLIs (demo/serve) can enable it without importing the training stack."""
from __future__ import annotations

import os

import jax


def enable_compile_cache():
    """Persistent XLA compilation cache for every CLI run (same policy as
    bench.py): repeat invocations skip recompiles — on hosts that reach
    the TPU through a relay those cost minutes each. Idempotent;
    JAX_CACHE_DIR overrides the location."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:   # noqa: BLE001 — cache is an optimization only
        pass
