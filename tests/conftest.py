"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (pjit/shard_map) is validated without TPU hardware via
`--xla_force_host_platform_device_count` (SURVEY.md §4 item 5).

The environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests must NOT
ride the tunnel — we unset it and force the CPU backend before any
computation, which also gives us the 8 virtual devices for sharding tests.
"""

import os

os.environ.pop("JAX_PLATFORMS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated (large fused
# programs recompiled identically every run); the disk cache is shared by
# xdist workers and across runs
from android_svo_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
