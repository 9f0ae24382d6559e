"""easyrec_tpu: a TPU-native, config-driven recommender framework.

Capability parity target: alibaba/EasyRec (config surface, model zoo,
train/eval/export loop) re-designed for JAX/XLA/Pallas on TPU meshes.
"""

__version__ = '0.1.0'
