"""Flagship benchmark models: Criteo-shaped DeepFM + Taobao-shaped
DIN / BST / MMoE.

Mirrors the reference's headline configs
(/root/reference/examples/configs/deepfm_on_criteo.config: 13 raw + 26 id
features, 16-dim embeddings, 1M hash buckets, batch 4096;
/root/reference/samples/model_config/{din,bst,mmoe}_on_taobao.config:
15 id features + 2 behavior sequences len 50, the headline workloads of
docs/source/benchmark.md:25-32) so the benches and the compile-check
exercise exactly the shapes that matter.
"""

from __future__ import annotations

from easyrec_tpu.config import get_configs_from_pipeline_str


def criteo_deepfm_config(batch_size: int = 4096,
                         hash_bucket_size: int = 1000000,
                         embedding_dim: int = 16,
                         num_dense: int = 13,
                         num_cat: int = 26,
                         model_dir: str = '/tmp/easyrec_bench'):
  fields = ['input_fields { input_name: "label" input_type: FLOAT }']
  features = []
  deep, wide = [], []
  for i in range(1, num_dense + 1):
    fields.append(
        'input_fields { input_name: "F%d" input_type: FLOAT }' % i)
    features.append(
        'features { input_names: "F%d" feature_type: RawFeature '
        'embedding_dim: %d min_val: 0.0 max_val: 1000.0 }' %
        (i, embedding_dim))
    deep.append('feature_names: "F%d"' % i)
    wide.append('feature_names: "F%d"' % i)
  for i in range(1, num_cat + 1):
    fields.append(
        'input_fields { input_name: "C%d" input_type: STRING }' % i)
    features.append(
        'features { input_names: "C%d" feature_type: IdFeature '
        'embedding_dim: %d hash_bucket_size: %d }' %
        (i, embedding_dim, hash_bucket_size))
    deep.append('feature_names: "C%d"' % i)
    wide.append('feature_names: "C%d"' % i)
  text = """
train_input_path: "synthetic"
eval_input_path: "synthetic"
model_dir: "%s"
train_config {
  log_step_count_steps: 100
  optimizer_config {
    adam_optimizer {
      learning_rate {
        exponential_decay_learning_rate {
          initial_learning_rate: 0.001
          decay_steps: 1000
          decay_factor: 0.5
          min_learning_rate: 0.00001
        }
      }
    }
  }
  num_steps: 1000
}
eval_config { metrics_set { auc {} } }
data_config {
  batch_size: %d
  label_fields: "label"
  %s
  input_type: DummyInput
  separator: "\\t"
}
feature_config {
  %s
}
model_config {
  model_class: "DeepFM"
  feature_groups {
    group_name: "deep"
    %s
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "wide"
    %s
    wide_deep: WIDE
  }
  deepfm {
    dnn { hidden_units: [256, 128, 64] }
    final_dnn { hidden_units: [256, 128, 64] }
  }
  embedding_regularization: 1e-5
}
""" % (model_dir, batch_size, '\n  '.join(fields), '\n  '.join(features),
       '\n    '.join(deep), '\n    '.join(wide))
  return get_configs_from_pipeline_str(text)


# Taobao ad-display schema (din/bst/mmoe_on_taobao.config): 15 id features
# with the reference's bucket sizes, price num_buckets 50, and two behavior
# sequences (brand / category) of max_seq_len 50.
_TAOBAO_ID_FEATURES = [
    ('pid', 10), ('adgroup_id', 100000), ('cate_id', 10000),
    ('campaign_id', 100000), ('customer', 100000), ('brand', 100000),
    ('user_id', 100000), ('cms_segid', 100), ('cms_group_id', 100),
    ('final_gender_code', 10), ('age_level', 10), ('pvalue_level', 10),
    ('shopping_level', 10), ('occupation', 10),
    ('new_user_class_level', 10),
]
_TAOBAO_USER = ['user_id', 'cms_segid', 'cms_group_id', 'age_level',
                'pvalue_level', 'shopping_level', 'occupation',
                'new_user_class_level']
_TAOBAO_ITEM = ['adgroup_id', 'cate_id', 'campaign_id', 'customer',
                'brand', 'price', 'pid']


def _taobao_schema(seq_len: int, embedding_dim: int, labels):
  fields, features = [], []
  for name in labels:
    fields.append(
        'input_fields { input_name: "%s" input_type: FLOAT }' % name)
  for name, buckets in _TAOBAO_ID_FEATURES:
    fields.append(
        'input_fields { input_name: "%s" input_type: STRING }' % name)
    features.append(
        'features { input_names: "%s" feature_type: IdFeature '
        'embedding_dim: %d hash_bucket_size: %d }' %
        (name, embedding_dim, buckets))
  fields.append('input_fields { input_name: "price" input_type: INT32 }')
  features.append(
      'features { input_names: "price" feature_type: IdFeature '
      'embedding_dim: %d num_buckets: 50 }' % embedding_dim)
  for name, buckets in (('tag_category_list', 10000),
                        ('tag_brand_list', 100000)):
    fields.append(
        'input_fields { input_name: "%s" input_type: STRING }' % name)
    features.append(
        'features { input_names: "%s" feature_type: SequenceFeature '
        'separator: "|" embedding_dim: %d hash_bucket_size: %d '
        'max_seq_len: %d }' % (name, embedding_dim, buckets, seq_len))
  return fields, features


def _taobao_pipeline(model_block: str, labels, batch_size: int,
                     seq_len: int, embedding_dim: int, model_dir: str):
  fields, features = _taobao_schema(seq_len, embedding_dim, labels)
  return get_configs_from_pipeline_str("""
train_input_path: "synthetic"
eval_input_path: "synthetic"
model_dir: "%s"
train_config {
  log_step_count_steps: 100
  optimizer_config {
    adam_optimizer {
      learning_rate {
        exponential_decay_learning_rate {
          initial_learning_rate: 0.001
          decay_steps: 1000
          decay_factor: 0.5
          min_learning_rate: 0.00001
        }
      }
    }
  }
  num_steps: 1000
}
eval_config { metrics_set { auc {} } }
data_config {
  batch_size: %d
  %s
  %s
  input_type: DummyInput
  separator: ","
}
feature_config {
  %s
}
model_config {
%s
  embedding_regularization: 5e-5
}
""" % (model_dir, batch_size,
       '\n  '.join('label_fields: "%s"' % l for l in labels),
       '\n  '.join(fields), '\n  '.join(features), model_block))


def _tower_groups():
  return """
  feature_groups {
    group_name: "user"
    %s
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "item"
    %s
    wide_deep: DEEP
  }""" % ('\n    '.join('feature_names: "%s"' % f for f in _TAOBAO_USER),
          '\n    '.join('feature_names: "%s"' % f for f in _TAOBAO_ITEM))


def taobao_din_config(batch_size: int = 4096, seq_len: int = 50,
                      embedding_dim: int = 16,
                      model_dir: str = '/tmp/easyrec_bench_din'):
  """MultiTowerDIN on the Taobao schema (din_on_taobao.config)."""
  model = """  model_class: "MultiTowerDIN"
%s
  seq_att_groups {
    group_name: "din"
    seq_att_map { key: "brand" hist_seq: "tag_brand_list" }
    seq_att_map { key: "cate_id" hist_seq: "tag_category_list" }
  }
  multi_tower {
    towers { input: "user" dnn { hidden_units: [256, 128, 96, 64] } }
    towers { input: "item" dnn { hidden_units: [256, 128, 96, 64] } }
    din_towers { input: "din" dnn { hidden_units: [128, 64, 32, 1] } }
    final_dnn { hidden_units: [128, 96, 64, 32, 16] }
    l2_regularization: 5e-7
  }""" % _tower_groups()
  return _taobao_pipeline(model, ['clk'], batch_size, seq_len,
                          embedding_dim, model_dir)


def taobao_bst_config(batch_size: int = 4096, seq_len: int = 50,
                      embedding_dim: int = 16,
                      model_dir: str = '/tmp/easyrec_bench_bst'):
  """MultiTowerBST on the Taobao schema (bst_on_taobao.config)."""
  model = """  model_class: "MultiTowerBST"
%s
  seq_att_groups {
    group_name: "bst"
    seq_att_map { key: "brand" hist_seq: "tag_brand_list" }
    seq_att_map { key: "cate_id" hist_seq: "tag_category_list" }
  }
  multi_tower {
    towers { input: "user" dnn { hidden_units: [256, 128, 96, 64] } }
    towers { input: "item" dnn { hidden_units: [256, 128, 96, 64] } }
    bst_towers { input: "bst" seq_len: %d multi_head_size: 4 }
    final_dnn { hidden_units: [128, 96, 64, 32, 16] }
    l2_regularization: 5e-7
  }""" % (_tower_groups(), seq_len)
  return _taobao_pipeline(model, ['clk'], batch_size, seq_len,
                          embedding_dim, model_dir)


def taobao_mmoe_config(batch_size: int = 4096, seq_len: int = 50,
                       embedding_dim: int = 16,
                       model_dir: str = '/tmp/easyrec_bench_mmoe'):
  """MMoE (ctr+cvr towers) on the Taobao schema (mmoe_on_taobao.config)."""
  all_feats = ([n for n, _ in _TAOBAO_ID_FEATURES] + ['price'] +
               ['tag_category_list', 'tag_brand_list'])
  model = """  model_class: "MMoE"
  feature_groups {
    group_name: "all"
    %s
    wide_deep: DEEP
  }
  mmoe {
    expert_dnn { hidden_units: [256, 192, 128, 64] }
    num_expert: 4
    task_towers {
      tower_name: "ctr"
      label_name: "clk"
      dnn { hidden_units: [256, 192, 128, 64] }
      num_class: 1
      weight: 1.0
      loss_type: CLASSIFICATION
      metrics_set { auc {} }
    }
    task_towers {
      tower_name: "cvr"
      label_name: "buy"
      dnn { hidden_units: [256, 192, 128, 64] }
      num_class: 1
      weight: 1.0
      loss_type: CLASSIFICATION
      metrics_set { auc {} }
    }
    l2_regularization: 1e-6
  }""" % '\n    '.join('feature_names: "%s"' % f for f in all_feats)
  return _taobao_pipeline(model, ['clk', 'buy'], batch_size, seq_len,
                          embedding_dim, model_dir)
