"""Test harness setup: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin in this image ignores JAX_PLATFORMS, so we force the CPU
backend through jax.config (which wins) and request 8 virtual host devices
for the multi-chip sharding tests. Real-TPU benchmarking lives in bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
