"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, and enable x64 for numerical-parity tests.

Note: this environment pins JAX_PLATFORMS=axon (a tunneled remote TPU) via
sitecustomize, and env vars set here are re-overridden at interpreter start —
only `jax.config.update("jax_platforms", ...)` after import reliably selects
the CPU backend. Eager ops on the tunneled TPU cost ~10s of remote compile
each, so tests must never run there.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from warpdemux_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
