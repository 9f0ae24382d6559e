"""Sequence combiners, eval_online, split-tower export."""

import glob
import json
import os

import numpy as np
import pytest

from easyrec_tpu.config import (get_configs_from_pipeline_file,
                                get_configs_from_pipeline_str)
from easyrec_tpu.train.trainer import Trainer
from easyrec_tpu.utils.synthetic import synthetic_batch
from tests import fixtures


@pytest.mark.parametrize('combiner', [
    'attention {}', 'multi_head_attention {}',
    'text_cnn { filter_sizes: 2 num_filters: 4 }'])
def test_sequence_combiners(combiner):
  text = """
train_input_path: "x"
eval_input_path: "x"
data_config {
  batch_size: 16
  label_fields: "clk"
  input_fields { input_name: "clk" input_type: FLOAT }
  input_fields { input_name: "uid" input_type: STRING }
  input_fields { input_name: "seq_cate" input_type: STRING }
  input_type: DummyInput
}
feature_config {
  features { input_names: "uid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 50 }
  features { input_names: "seq_cate" feature_type: SequenceFeature
             embedding_dim: 8 hash_bucket_size: 40 max_seq_len: 6
             sequence_combiner { %s } }
}
model_config {
  model_class: "MultiTower"
  feature_groups {
    group_name: "all"
    feature_names: "uid" feature_names: "seq_cate" wide_deep: DEEP
  }
  multi_tower {
    towers { input: "all" dnn { hidden_units: 8 use_bn: false } }
    final_dnn { hidden_units: 8 use_bn: false }
  }
}
""" % combiner
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk'], 16)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(4):
    state, loss = trainer.train_step(state, sharded)
    losses.append(float(loss['total_loss']))
  assert all(np.isfinite(losses)), (combiner, losses)
  assert losses[-1] < losses[0]


def test_eval_online_writes_results(tmp_path):
  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=60)
  cfg = get_configs_from_pipeline_file(cfg_path)
  cfg.eval_config.eval_online = True
  cfg.train_config.save_checkpoints_steps = 30
  trainer = Trainer(cfg)
  trainer.fit()
  files = glob.glob(os.path.join(cfg.model_dir,
                                 'online_eval_result.txt-*'))
  assert files, 'no online eval results written'
  data = json.load(open(files[0]))
  assert 'auc' in data


def test_split_tower_export(tmp_path):
  """Train a tiny DSSM, split the export, drive each tower with ONLY its
  own columns."""
  from easyrec_tpu import main as driver
  from easyrec_tpu.export.predictor import Predictor
  from easyrec_tpu.tools.split_model import split_export
  import tests.test_samplers as ts

  cfg_path = ts._setup(tmp_path, ts.NEG_SAMPLER, num_steps=40)
  result = driver.train_and_evaluate(cfg_path)
  export_dir = result['export_dir']
  out = split_export(export_dir, os.path.join(str(tmp_path), 'split'))
  assert set(out) == {'user', 'item'}

  user_meta = json.load(open(os.path.join(out['user'],
                                          'export_meta.json')))
  assert user_meta['required_columns'] == ['uid']

  user_pred = Predictor(out['user'])
  res = user_pred.predict_columns(
      {'uid': np.array(['u1', 'u2', 'u3'], object)})
  assert set(res) == {'user_emb'}
  assert res['user_emb'].shape[0] == 3
  # same user twice -> same embedding; different user -> different
  res2 = user_pred.predict_columns(
      {'uid': np.array(['u1', 'u1', 'u2'], object)})
  np.testing.assert_allclose(res2['user_emb'][0], res2['user_emb'][1])
  assert not np.allclose(res2['user_emb'][0], res2['user_emb'][2])

  item_pred = Predictor(out['item'])
  res3 = item_pred.predict_columns(
      {'iid': np.array(['i1', 'i2'], object),
       'cate': np.array(['c1', 'c2'], object)})
  assert set(res3) == {'item_emb'}
