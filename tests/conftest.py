"""Test harness: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

# the jaxtyping pytest plugin imports jax before this conftest runs, which
# freezes JAX_PLATFORMS from the outer environment — override via config
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
