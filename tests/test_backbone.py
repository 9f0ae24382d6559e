"""Backbone DSL: block-DAG composite models build, train and learn.

Mirrors the reference's *_backbone_on_* sample configs
(easy_rec/python/layers/backbone.py DAG semantics).
"""

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.train.trainer import Trainer
from tests import fixtures

MASKNET_BODY = """
  feature_groups {
    group_name: "all"
    feature_names: "d1" feature_names: "d2"
    feature_names: "c1" feature_names: "c2" feature_names: "c3"
    wide_deep: DEEP
  }
  backbone {
    blocks {
      name: "feat"
      inputs { feature_group_name: "all" }
      input_layer { do_layer_norm: true }
    }
    blocks {
      name: "masknet"
      inputs { block_name: "feat" }
      keras_layer {
        class_name: "MaskNet"
        masknet {
          mask_blocks { output_size: 32 reduction_factor: 1.0 }
          mask_blocks { output_size: 32 reduction_factor: 1.0 }
          mlp { hidden_units: 16 use_bn: false }
        }
      }
    }
    top_mlp { hidden_units: 8 use_bn: false final_activation: "relu" }
  }
"""

# struct-params + lambda + repeat + senet on a 3d input
MIXED_BODY = """
  feature_groups {
    group_name: "cats"
    feature_names: "c1" feature_names: "c2" feature_names: "c3"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "nums"
    feature_names: "d1" feature_names: "d2"
    wide_deep: DEEP
  }
  backbone {
    blocks {
      name: "cats3d"
      inputs { feature_group_name: "cats" }
      input_layer { only_output_3d_tensor: true }
    }
    blocks {
      name: "senet"
      inputs { block_name: "cats3d" }
      keras_layer {
        class_name: "SENet"
        senet { reduction_ratio: 2 num_squeeze_group: 2 }
      }
    }
    blocks {
      name: "scaled"
      inputs { block_name: "senet" input_fn: "lambda x: x * 2.0" }
      lambda { expression: "lambda x: jnp.tanh(x)" }
    }
    blocks {
      name: "deep"
      inputs { feature_group_name: "nums" }
      inputs { block_name: "scaled" }
      keras_layer {
        class_name: "MLP"
        st_params {
          fields {
            key: "hidden_units"
            value { list_value { values { number_value: 24 }
                                 values { number_value: 12 } } }
          }
          fields { key: "use_bn" value { bool_value: false } }
        }
      }
    }
    concat_blocks: "deep"
    top_mlp { hidden_units: 8 use_bn: false }
  }
"""

MULTI_TASK_BODY = """
  feature_groups {
    group_name: "all"
    feature_names: "d1" feature_names: "d2"
    feature_names: "c1" feature_names: "c2" feature_names: "c3"
    wide_deep: DEEP
  }
  backbone {
    blocks {
      name: "mmoe"
      inputs { feature_group_name: "all" }
      keras_layer {
        class_name: "MMoE"
        mmoe { num_task: 2 num_expert: 3
               expert_mlp { hidden_units: 16 use_bn: false } }
      }
    }
    output_blocks: "mmoe"
  }
  model_params {
    task_towers {
      tower_name: "ctr" label_name: "label"
      dnn { hidden_units: 8 use_bn: false }
    }
    task_towers {
      tower_name: "cvr" label_name: "label"
      dnn { hidden_units: 8 use_bn: false }
    }
  }
"""


def _train(tmp_path, body, model_class='RankModel', num_steps=120):
  cfg_path = fixtures.write_pipeline(
      tmp_path, model_class=model_class, model_body=body,
      num_steps=num_steps)
  cfg = get_configs_from_pipeline_file(cfg_path)
  trainer = Trainer(cfg)
  return trainer.fit()


def test_backbone_masknet_learns(tmp_path):
  result = _train(tmp_path, MASKNET_BODY)
  assert result['eval_metrics']['auc'] > 0.7, result['eval_metrics']


def test_backbone_mixed_blocks(tmp_path):
  result = _train(tmp_path, MIXED_BODY, num_steps=60)
  hist = result['history']
  assert hist[-1]['loss'] < hist[0]['loss']
  assert result['eval_metrics']['auc'] > 0.6


def test_backbone_multi_task(tmp_path):
  result = _train(tmp_path, MULTI_TASK_BODY, model_class='MultiTaskModel',
                  num_steps=60)
  assert np.isfinite(result['history'][-1]['loss'])
  assert result['eval_metrics']['auc'] > 0.6


RECURRENT_DCN_BODY = """
  feature_groups {
    group_name: "all"
    feature_names: "d1" feature_names: "d2"
    feature_names: "c1" feature_names: "c2" feature_names: "c3"
    wide_deep: DEEP
  }
  backbone {
    blocks {
      name: "input"
      inputs { feature_group_name: "all" }
      input_layer {}
    }
    blocks {
      name: "cross"
      inputs { block_name: "input" input_fn: "lambda x: [x, x]" }
      recurrent {
        num_steps: 3
        fixed_input_index: 0
        keras_layer { class_name: "Cross" }
      }
    }
    blocks {
      name: "deep"
      inputs { block_name: "input" }
      keras_layer {
        class_name: "MLP"
        mlp { hidden_units: [16] use_bn: false }
      }
    }
    concat_blocks: "cross"
    concat_blocks: "deep"
    top_mlp { hidden_units: [16, 8] use_bn: false }
  }
"""


def test_backbone_recurrent_cross(tmp_path):
  """DCN-v2 expressed as a recurrent Cross block (the reference's
  dcn_backbone_on_taobao.config pattern: fixed x0 + 3 shared steps)."""
  result = _train(tmp_path, RECURRENT_DCN_BODY, num_steps=120)
  assert result['eval_metrics']['auc'] > 0.7, result['eval_metrics']


def test_numeric_embedding_layers():
  """Periodic / AutoDis / NaryDis numeric embeddings produce the right
  shapes and gradients."""
  import jax
  import jax.numpy as jnp
  from easyrec_tpu.layers import numeric_embedding as NE

  x = jnp.asarray(np.random.default_rng(0).random((8, 5)), jnp.float32)
  for mod, extra in [
      (NE.PeriodicEmbedding(embedding_dim=6, sigma=1.0), {}),
      (NE.AutoDisEmbedding(embedding_dim=6, num_bins=4,
                           temperature=0.5), {}),
      (NE.NaryDisEmbedding(embedding_dim=6, carries=(2, 9),
                           inter_ary_pooling='sum'), {}),
  ]:
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (8, 30), (type(mod).__name__, out.shape)
    g = jax.grad(lambda p: mod.apply(p, x).sum())(params)
    assert all(np.isfinite(v).all()
               for v in jax.tree_util.tree_leaves(g))


# tf.keras fallback class names used verbatim in reference shipped configs
# (samples/*: 'Dense', 'Add', 'Dropout') + Dice/GateNN/LayerNormalization
KERAS_FALLBACK_BODY = """
  feature_groups {
    group_name: "nums"
    feature_names: "d1" feature_names: "d2"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "cats"
    feature_names: "c1" feature_names: "c2" feature_names: "c3"
    wide_deep: DEEP
  }
  backbone {
    blocks {
      name: "a"
      inputs { feature_group_name: "nums" }
      keras_layer {
        class_name: "Dense"
        st_params {
          fields { key: "units" value { number_value: 12 } }
          fields { key: "activation" value { string_value: "relu" } }
        }
      }
    }
    blocks {
      name: "b"
      inputs { feature_group_name: "cats" }
      keras_layer {
        class_name: "Dense"
        st_params { fields { key: "units" value { number_value: 12 } } }
      }
    }
    blocks {
      name: "sum"
      inputs { block_name: "a" }
      inputs { block_name: "b" }
      merge_inputs_into_list: true
      keras_layer { class_name: "Add" }
    }
    blocks {
      name: "dice"
      inputs { block_name: "sum" }
      keras_layer { class_name: "Dice" }
    }
    blocks {
      name: "bn"
      inputs { block_name: "dice" }
      keras_layer { class_name: "BatchNormalization" }
    }
    blocks {
      name: "gate"
      inputs { block_name: "bn" }
      keras_layer { class_name: "GateNN" }
    }
    blocks {
      name: "ln"
      inputs { block_name: "gate" }
      keras_layer { class_name: "LayerNormalization" }
    }
    concat_blocks: "ln"
    top_mlp { hidden_units: 8 use_bn: false }
  }
"""


def test_backbone_keras_fallback_layers(tmp_path):
  result = _train(tmp_path, KERAS_FALLBACK_BODY)
  assert result['eval_metrics']['auc'] > 0.7, result['eval_metrics']


def test_mlp_bn_after_activation_and_initializer():
  import jax
  import jax.numpy as jnp
  from easyrec_tpu.layers.dnn import MLP
  x = jnp.ones((4, 8))
  m = MLP(hidden_units=(16, 8), use_bn=True, use_final_bn=True,
          use_bn_after_activation=True, kernel_initializer='zeros')
  vars_ = m.init(jax.random.PRNGKey(0), x, True)
  # zeros initializer -> all kernels zero
  k = vars_['params']['dense_0']['kernel']
  assert float(jnp.abs(k).max()) == 0.0
  y, _ = m.apply(vars_, x, True, mutable=['batch_stats'])
  assert np.isfinite(np.asarray(y)).all()
  # default initializer path still works, pre-activation BN
  m2 = MLP(hidden_units=(16, 8))
  vars2 = m2.init(jax.random.PRNGKey(0), x, True)
  assert float(jnp.abs(vars2['params']['dense_0']['kernel']).max()) > 0


def test_bst_target_position_options():
  import jax
  import jax.numpy as jnp
  from easyrec_tpu.layers.attention import BSTEncoder
  rng = np.random.default_rng(0)
  seq = jnp.asarray(rng.normal(size=(4, 6, 8)), jnp.float32)
  mask = jnp.ones((4, 6), jnp.float32)
  tgt = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
  outs = {}
  for pos in ('head', 'tail'):
    m = BSTEncoder(hidden_size=16, target_item_position=pos)
    v = m.init(jax.random.PRNGKey(0), seq, mask, tgt)
    outs[pos] = np.asarray(m.apply(v, seq, mask, tgt,
                                   rngs={'dropout': jax.random.PRNGKey(1)}))
    assert outs[pos].shape == (4, 16)
    assert np.isfinite(outs[pos]).all()
  # no target + reserved position slot still works
  m = BSTEncoder(hidden_size=16, reserve_target_position=True)
  v = m.init(jax.random.PRNGKey(0), seq, mask, None)
  out = m.apply(v, seq, mask, None,
                rngs={'dropout': jax.random.PRNGKey(1)})
  assert np.isfinite(np.asarray(out)).all()


def test_packed_mha_matches_flax():
  """PackedMHA (head-packed block-diagonal attention) must match
  flax.linen.MultiHeadDotProductAttention bit-for-bit in structure and
  numerically in output: same param tree, swap-in compatible."""
  import flax.linen as nn
  import jax
  import jax.numpy as jnp
  from easyrec_tpu.layers.attention import PackedMHA
  rng = np.random.default_rng(3)
  b, l, d, h = 5, 9, 32, 4
  x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
  mask = jnp.asarray(rng.random((b, l)) > 0.3, jnp.float32)
  mask = mask.at[:, 0].set(1.0)               # no fully-masked rows
  ours = PackedMHA(num_heads=h, qkv_features=d, out_features=d,
                   dropout_rate=0.0, deterministic=True)
  ref = nn.MultiHeadDotProductAttention(
      num_heads=h, qkv_features=d, out_features=d, dropout_rate=0.0,
      deterministic=True)
  v_ours = ours.init(jax.random.PRNGKey(0), x, x, mask)
  v_ref = ref.init(jax.random.PRNGKey(0), x, x,
                   mask=mask[:, None, None, :] > 0)
  ours_tree = jax.tree.map(lambda a: a.shape, v_ours['params'])
  ref_tree = jax.tree.map(lambda a: a.shape, v_ref['params'])
  assert ours_tree == ref_tree, (ours_tree, ref_tree)
  # run OUR module on the FLAX-initialized params (swap-in contract)
  y_ref = ref.apply(v_ref, x, x, mask=mask[:, None, None, :] > 0)
  import os
  for impl, atol in [('stock', 2e-5), ('vpu', 2e-4), ('vpu_bf16', 0.05)]:
    os.environ['EASYREC_ATTN_IMPL'] = impl
    try:
      y_ours = ours.apply(v_ref, x, x, mask)
    finally:
      del os.environ['EASYREC_ATTN_IMPL']
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                               atol=atol, rtol=atol,
                               err_msg='impl=%s' % impl)
  # cross-attention shape (CMBF/Uniter towers): kv length != q length
  xkv = jnp.asarray(rng.normal(size=(b, 7, d)), jnp.float32)
  mkv = jnp.ones((b, 7), jnp.float32)
  y2 = ours.apply(ours.init(jax.random.PRNGKey(1), x, xkv, mkv),
                  x, xkv, mkv)
  assert y2.shape == (b, l, d)
  assert np.isfinite(np.asarray(y2)).all()
