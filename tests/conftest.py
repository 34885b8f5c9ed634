"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual XLA devices so multi-chip sharding
(pjit / shard_map over a Mesh) is exercised without real TPU hardware.
This must happen before the first `import jax` anywhere in the test run.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already have been imported by a pytest plugin (jaxtyping), in
# which case it captured JAX_PLATFORMS from the outer environment; the
# config update below overrides that as long as no backend is live yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
