"""Environment helpers: persistent XLA compilation cache."""
from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache so large sparse-model
    programs compile once per machine instead of once per process."""
    import jax

    if path is None:
        path = os.environ.get(
            "FCAF3D_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".fcaf3d_jax_cache")
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
