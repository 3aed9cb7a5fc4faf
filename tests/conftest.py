"""Test configuration.

- Force the CPU backend with 8 virtual devices so sharding/collective tests
  run anywhere (the multi-chip story is validated on a fake mesh, per
  SURVEY.md §4's test plan).
- Enable float64: the reference goldens are specified to 1e-6
  (gp/gp_test.go), which float32 cannot hold through a Cholesky.
"""

import os

# Hard override: the session environment pins JAX_PLATFORMS=axon (a remote
# TPU tunnel) and its sitecustomize re-applies it via jax.config at import
# time, so both the env var AND jax.config must be forced back to cpu here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
