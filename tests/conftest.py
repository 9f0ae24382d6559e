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

# Persistent XLA compilation cache: most suite wall time is repeated
# jit compilation of near-identical train/eval steps across test
# processes; with a warm cache the suite spends its time actually
# training (VERDICT r3 next-step 3). Set EASYREC_TEST_NO_CACHE=1 to
# measure cold-compile behavior.
if not os.environ.get('EASYREC_TEST_NO_CACHE'):
  _cache_dir = os.environ.get(
      'JAX_COMPILATION_CACHE_DIR',
      os.path.join(os.path.expanduser('~'), '.cache', 'easyrec_tpu_jax'))
  os.makedirs(_cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', _cache_dir)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
  # EXPORT the cache to child processes too: the quality-proxy/harness
  # smokes and multihost tests spawn CLI subprocesses that were paying
  # a full cold XLA compile every suite run (the top suite-time items:
  # 513 s + 264 s in the r5 duration profile). JAX reads these env vars
  # natively at startup.
  os.environ['JAX_COMPILATION_CACHE_DIR'] = _cache_dir
  os.environ['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '0.5'
  os.environ['JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES'] = '-1'
  # NOTE: 'jax_persistent_cache_enable_xla_caches = all' was tried and
  # reverted: it persists XLA:CPU AOT kernels with host-feature flags
  # (+prefer-no-scatter) that do not round-trip on reload


# ---- suite lanes (tests/run.py): convergence-training tests are
# auto-marked 'slow' by module so the pre-commit lane can skip them
_SLOW_MODULES = {
    'test_learnability', 'test_learnability_extra', 'test_samples',
    'test_multihost_train', 'test_multihost_eval',
    'test_quality_harness', 'test_big_model_export',
    'test_cross_topology_ckpt', 'test_seq_split_online',
}


def pytest_collection_modifyitems(config, items):
  import pytest as _pytest
  for item in items:
    mod = item.module.__name__.rsplit('.', 1)[-1]
    if mod in _SLOW_MODULES:
      item.add_marker(_pytest.mark.slow)
