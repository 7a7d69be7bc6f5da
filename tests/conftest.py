"""Test configuration: run the suite on a virtual 8-device CPU mesh.

TPU hardware isn't assumed for CI; sharding/collective tests use
`xla_force_host_platform_device_count=8` per the project's multi-chip
validation strategy. NOTE: the JAX_PLATFORMS env var alone is not honored
when the axon TPU plugin is installed — `jax.config.update` is required.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the sparse models are compile-bound on
# XLA-CPU (minutes per train step cold), so reruns of the suite must not
# re-pay compiles. Same cache `bench.py` / the dryrun use (utils/env.py).
from fcaf3d_tpu.utils import setup_compilation_cache  # noqa: E402

setup_compilation_cache()
