"""easyrec_tpu: a TPU-native, config-driven recommender framework.

Capability parity target: alibaba/EasyRec (config surface, model zoo,
train/eval/export loop) re-designed for JAX/XLA/Pallas on TPU meshes.
"""

__version__ = '0.1.0'

# Honor JAX_PLATFORMS even when a site-installed PJRT plugin freezes the
# env var at registration time (observed with the axon TPU plugin:
# `JAX_PLATFORMS=cpu python -m easyrec_tpu.train_eval` still tried — and
# hung on — the TPU client). jax.config wins over the frozen snapshot.
import os as _os

if _os.environ.get('JAX_PLATFORMS'):
  import jax as _jax

  _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
