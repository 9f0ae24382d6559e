"""Loss params: OHEM mining, pairwise-hinge options, JRC
same_label_loss, listwise distill."""

import jax.numpy as jnp
import numpy as np

from easyrec_tpu.losses import losses as L


def test_ohem_focal_keeps_hard_examples():
  rng = np.random.default_rng(0)
  labels = jnp.asarray((rng.uniform(size=128) > 0.5).astype(np.float32))
  logits = jnp.asarray(rng.normal(size=128), jnp.float32)
  ones = jnp.ones(128, jnp.float32)
  full = float(L.binary_focal_loss(labels, logits, ones))
  hard = float(L.binary_focal_loss(labels, logits, ones,
                                   ohem_ratio=0.25))
  # mining keeps only the hardest quarter -> mean loss must grow
  assert hard > full, (hard, full)
  almost = float(L.binary_focal_loss(labels, logits, ones,
                                     ohem_ratio=0.999))
  assert abs(almost - full) < 0.05 * full, (almost, full)


def test_ohem_pairwise_losses():
  rng = np.random.default_rng(1)
  labels = jnp.asarray((rng.uniform(size=64) > 0.5).astype(np.float32))
  logits = jnp.asarray(rng.normal(size=64), jnp.float32)
  for fn in (L.pairwise_loss, L.pairwise_logistic_loss,
             L.pairwise_focal_loss):
    full = float(fn(labels, logits))
    hard = float(fn(labels, logits, ohem_ratio=0.3))
    assert np.isfinite(full) and np.isfinite(hard)
    assert hard >= full, (fn.__name__, hard, full)


def test_pairwise_hinge_options():
  rng = np.random.default_rng(2)
  labels = jnp.asarray((rng.uniform(size=64) > 0.5).astype(np.float32))
  logits = jnp.asarray(rng.normal(size=64), jnp.float32)
  default = float(L.pairwise_hinge_loss(labels, logits))
  fixed_margin = float(L.pairwise_hinge_loss(labels, logits,
                                             use_label_margin=False,
                                             margin=2.0))
  expo = float(L.pairwise_hinge_loss(labels, logits, use_exponent=True))
  assert np.isfinite(default) and np.isfinite(fixed_margin)
  assert np.isfinite(expo)
  assert abs(default - fixed_margin) > 1e-6
  hard = float(L.pairwise_hinge_loss(labels, logits, ohem_ratio=0.25))
  assert hard >= default


def test_jrc_same_label_loss_toggle():
  rng = np.random.default_rng(3)
  labels = jnp.asarray((rng.uniform(size=32) > 0.5).astype(np.float32))
  logits2 = jnp.asarray(rng.normal(size=(32, 2)), jnp.float32)
  sess = jnp.asarray(rng.integers(0, 4, 32))
  a = float(L.jrc_loss(labels, logits2, sess, same_label_loss=True))
  b = float(L.jrc_loss(labels, logits2, sess, same_label_loss=False))
  assert np.isfinite(a) and np.isfinite(b)
  assert abs(a - b) > 1e-6


def test_listwise_distill_loss():
  rng = np.random.default_rng(4)
  # teacher positions 1..20, smaller = better
  positions = jnp.asarray(rng.integers(1, 21, 64).astype(np.float32))
  logits = jnp.asarray(rng.normal(size=64), jnp.float32)
  sess = jnp.asarray(rng.integers(0, 8, 64))
  rel = jnp.log1p(16.0) - jnp.log(jnp.clip(positions, 1.0, 16.0))
  good = float(L.listwise_distill_loss(positions, rel, sess,
                                       label_clip_max_value=16.0))
  bad = float(L.listwise_distill_loss(positions, -rel, sess,
                                      label_clip_max_value=16.0))
  assert np.isfinite(good) and np.isfinite(bad)
  # scores aligned with teacher relevance beat anti-aligned scores
  assert good < bad, (good, bad)


def test_learn_loss_weight_selective(tmp_path):
  """Under Uncertainty strategy, only losses with learn_loss_weight get
  learned weights; the rest keep fixed weights (rank_model.py:303-320)."""
  from easyrec_tpu.config import get_configs_from_pipeline_file
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils.synthetic import synthetic_batch
  from tests import fixtures
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(
          tmp_path, num_steps=5,
          extra=''))
  mc = cfg.model_config
  l1 = mc.losses.add()
  l1.loss_type = 0  # CLASSIFICATION
  l1.learn_loss_weight = True
  l2 = mc.losses.add()
  l2.loss_type = 10  # BINARY_FOCAL_LOSS
  l2.weight = 2.0
  mc.loss_weight_strategy = mc.Uncertainty
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['label'], 32, seed=1)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  state, loss_dict = trainer.train_step(state, sharded)
  assert np.isfinite(float(loss_dict['total_loss']))
  # the learned-uncertainty param exists
  import jax
  names = [p for p, _ in
           jax.tree_util.tree_leaves_with_path(state.params)]
  flat = str(names)
  assert 'loss_uncertainty' in flat, flat
