"""Native text feature ops, ExprFeature string functions, fit_on_eval,
config-from-template tool."""

import os

import numpy as np
import pytest

from easyrec_tpu.config import (get_configs_from_pipeline_file,
                                get_configs_from_pipeline_str)


def test_native_text_ops_match_python():
  from easyrec_tpu.ops import hashing, text_ops
  rng = np.random.default_rng(0)
  words = ['alpha', 'beta', 'gamma', 'delta', '']
  a = np.array([' '.join(rng.choice(words, 3)) for _ in range(50)], object)
  b = np.array([' '.join(rng.choice(words, 4)) for _ in range(50)], object)

  lib = hashing._load_native()
  assert lib is not None and hasattr(lib, 'edit_distance_batch'), \
      'native text ops did not build'

  ed_native = text_ops.edit_distance(a, b)
  qcr_native = text_ops.query_common_ratio(a, b)
  # force the python fallback and compare
  hashing._NATIVE = None
  try:
    ed_py = text_ops.edit_distance(a, b)
    qcr_py = text_ops.query_common_ratio(a, b)
  finally:
    hashing._NATIVE = lib
  np.testing.assert_array_equal(ed_native, ed_py)
  np.testing.assert_allclose(qcr_native, qcr_py, rtol=1e-6)

  norm = text_ops.text_normalize(np.array(['Hello, World!'], object))
  assert norm[0].replace(' ', '') == 'helloworld'


def test_expr_feature_string_functions(tmp_path):
  """ExprFeature with query/title overlap ratio trains end-to-end."""
  train = os.path.join(str(tmp_path), 'train.csv')
  rng = np.random.default_rng(0)
  words = ['red', 'blue', 'green', 'fast', 'slow', 'car', 'bike']
  with open(train, 'w') as f:
    for _ in range(512):
      q = ' '.join(rng.choice(words, 2))
      overlap = rng.random() < 0.5
      t = q + ' extra' if overlap else ' '.join(rng.choice(words, 2))
      label = int(overlap)
      f.write('%d,%s,%s\n' % (label, q, t))
  text = """
train_input_path: "%s"
eval_input_path: "%s"
model_dir: "%s"
train_config {
  optimizer_config { adam_optimizer {
    learning_rate { constant_learning_rate { learning_rate: 0.05 } } } }
  num_steps: 40
}
eval_config { metrics_set { auc {} } }
data_config {
  batch_size: 64
  label_fields: "label"
  input_fields { input_name: "label" input_type: FLOAT }
  input_fields { input_name: "query" input_type: STRING }
  input_fields { input_name: "title" input_type: STRING }
  input_type: CSVInput
}
feature_config {
  features { input_names: "query" input_names: "title"
             feature_name: "qt_overlap"
             feature_type: ExprFeature
             expression: "query_common_ratio(query, title)" }
  features { input_names: "query" feature_type: IdFeature
             embedding_dim: 4 hash_bucket_size: 100 }
}
model_config {
  model_class: "WideAndDeep"
  feature_groups {
    group_name: "deep"
    feature_names: "qt_overlap" feature_names: "query" wide_deep: DEEP
  }
  feature_groups {
    group_name: "wide" feature_names: "query" wide_deep: WIDE
  }
  wide_and_deep { dnn { hidden_units: 16 use_bn: false } }
}
""" % (train, train, os.path.join(str(tmp_path), 'ckpt'))
  cfg = get_configs_from_pipeline_str(text)
  from easyrec_tpu.train.trainer import Trainer
  result = Trainer(cfg).fit()
  # overlap ratio fully determines the label -> near-perfect AUC
  assert result['eval_metrics']['auc'] > 0.95, result['eval_metrics']


def test_fit_on_eval(tmp_path):
  from easyrec_tpu import main as driver
  from tests import fixtures
  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=30)
  result = driver.train_and_evaluate(cfg_path, fit_on_eval=True,
                                     fit_on_eval_steps=3)
  assert result['global_step'] == 33


def test_create_config_from_template(tmp_path):
  from easyrec_tpu.tools import create_config_from_excel as tool
  template = os.path.join(str(tmp_path), 'features.csv')
  with open(template, 'w') as f:
    f.write('name,data_type,feature_type,hash_bucket_size,num_buckets,'
            'embedding_dim,boundaries,group,wide_deep,separator,'
            'max_seq_len\n')
    f.write('label,float,label,,,,,,,,\n')
    f.write('uid,string,id,1000,,16,,user,deep,,\n')
    f.write('age,float,raw,,,,18|25|35|50,user,deep,,\n')
    f.write('iid,string,id,5000,,16,,item,deep,,\n')
  out = os.path.join(str(tmp_path), 'pipeline.config')
  tool.main(['--template', template, '--model_class', 'MultiTower',
             '--output_path', out])
  cfg = get_configs_from_pipeline_file(out)
  assert cfg.model_config.model_class == 'MultiTower'
  assert len(cfg.feature_config.features) == 3
  by_name = {fc.input_names[0]: fc for fc in cfg.feature_config.features}
  assert by_name['uid'].hash_bucket_size == 1000
  assert list(by_name['age'].boundaries) == [18.0, 25.0, 35.0, 50.0]
  assert {g.group_name for g in cfg.model_config.feature_groups} == \
      {'user', 'item'}
