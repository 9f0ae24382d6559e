"""HPO local tuner, add_boundaries, pre_check."""

import json
import os

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file
from tests import fixtures


def test_hpo_random_search(tmp_path):
  from easyrec_tpu.hpo.tuner import LocalTuner
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=40))
  space = [
      {'name': 'train_config.optimizer_config[0].adam_optimizer.'
               'learning_rate.constant_learning_rate.learning_rate',
       'type': 'double', 'min': 1e-3, 'max': 1e-2, 'log_scale': True},
      {'name': 'model_config.deepfm.dnn.hidden_units',
       'type': 'categorical', 'candidates': [[16], [32, 16]]},
  ]
  tuner = LocalTuner(cfg, space, metric='auc', num_trials=2)
  summary = tuner.run()
  assert len(summary['trials']) == 2
  assert summary['best'] is not None
  assert summary['best']['auc'] > 0.6
  assert os.path.exists(os.path.join(cfg.model_dir, 'hpo_result.json'))
  # trial dirs are separate
  assert os.path.isdir(os.path.join(cfg.model_dir, 'hpo_trial_0'))


def test_hpo_bayes_search(tmp_path, monkeypatch):
  """GP-EI mode concentrates trials near the optimum of a synthetic
  objective (driver monkeypatched: no real training)."""
  from easyrec_tpu import main as driver
  from easyrec_tpu.hpo.tuner import LocalTuner
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=1))

  lr_key = ('train_config.optimizer_config[0].adam_optimizer.'
            'learning_rate.constant_learning_rate.learning_rate')

  def fake_train(config):
    lr = (config.train_config.optimizer_config[0].adam_optimizer
          .learning_rate.constant_learning_rate.learning_rate)
    # peak at lr = 10^-2.5 ~= 3.16e-3
    auc = 0.9 - (np.log10(lr) + 2.5) ** 2
    return {'eval_metrics': {'auc': float(auc)}}

  monkeypatch.setattr(driver, 'train_and_evaluate', fake_train)
  space = [{'name': lr_key, 'type': 'double',
            'min': 1e-4, 'max': 1e-1, 'log_scale': True}]
  tuner = LocalTuner(cfg, space, metric='auc', mode='bayes',
                     num_trials=10, seed=11)
  summary = tuner.run()
  assert len(summary['trials']) == 10
  # GP trials (after the random seeds) should find the peak region
  assert summary['best']['auc'] > 0.85, summary['best']
  lr_best = summary['best']['assignment'][lr_key]
  assert 1e-4 <= lr_best <= 1e-1


def test_add_boundaries(tmp_path):
  from easyrec_tpu.tools.add_boundaries_to_config import add_boundaries
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=10))
  n = add_boundaries(cfg, num_buckets=8)
  assert n == 2  # d1, d2
  fc = [f for f in cfg.feature_config.features
        if f.input_names[0] == 'd1'][0]
  assert 3 <= len(fc.boundaries) <= 7
  assert list(fc.boundaries) == sorted(fc.boundaries)
  # the bucketized config still trains
  from easyrec_tpu.train.trainer import Trainer
  cfg.train_config.num_steps = 10
  result = Trainer(cfg).fit(checkpoint=False)
  assert np.isfinite(result['eval_metrics']['loss'])


def test_add_feature_info_to_config(tmp_path):
  from easyrec_tpu.tools import add_feature_info_to_config as afi
  cfg_path = str(tmp_path / 'samples' / 'din.config')
  os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
  import shutil
  shutil.copy('samples/multi_tower_din.config', cfg_path)
  info = {
      'uid': {'embedding_dim': 24, 'hash_bucket_size': 5000},
      'age': {'embedding_dim': 4, 'boundary': [0.0, 18.0, 30.0, 60.0]},
      'tags': {'message': 'DROP IT'},
      'seq_cate': {'message': 'DROP IT'},
      '__NUM_STEPS__': {'num_steps': 1234},
  }
  info_path = str(tmp_path / 'info.json')
  with open(info_path, 'w') as f:
    json.dump(info, f)
  out_path = str(tmp_path / 'out.config')
  afi.main(['--template_config_path', cfg_path,
            '--output_config_path', out_path,
            '--feature_info_path', info_path])

  cfg = get_configs_from_pipeline_file(out_path)
  from easyrec_tpu.config import config_util
  feats = {fc.input_names[0]: fc
           for fc in config_util.get_feature_configs(cfg)}
  assert 'tags' not in feats and 'seq_cate' not in feats
  assert feats['uid'].embedding_dim == 24
  assert feats['uid'].hash_bucket_size == 5000
  assert list(feats['age'].boundaries) == [0.0, 18.0, 30.0, 60.0]
  assert cfg.train_config.num_steps == 1234
  groups = {g.group_name: list(g.feature_names)
            for g in cfg.model_config.feature_groups}
  assert 'tags' not in groups['user']
  att = cfg.model_config.seq_att_groups[0].seq_att_map[0]
  assert 'seq_cate' not in list(att.hist_seq)


def test_pre_check_stacked_dims(tmp_path):
  """DeepFM with mixed embedding dims in the fm-stacked group is
  reported at config time (it would fail at trace time otherwise)."""
  from easyrec_tpu.tools.pre_check import check_config
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=1))
  assert check_config(cfg) == []
  feats = {fc.input_names[0]: fc
           for fc in cfg.feature_config.features or cfg.feature_configs}
  feats['c1'].embedding_dim = 16
  problems = check_config(cfg)
  assert any('shared embedding_dim' in p for p in problems), problems


def test_pre_check_catches_errors(tmp_path):
  from easyrec_tpu.tools.pre_check import check_config, check_data
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=10))
  assert check_config(cfg) == []
  assert check_data(cfg) == []

  # break it: feature reading a missing input + group with unknown feature
  cfg.feature_config.features[0].input_names[0] = 'nope'
  cfg.model_config.feature_groups[0].feature_names.append('ghost')
  problems = check_config(cfg)
  assert any('nope' in p for p in problems)
  assert any('ghost' in p for p in problems)


def test_convert_config_format_round_trip(tmp_path):
  """text .config -> .json -> .config preserves the pipeline proto
  (reference tools/convert_config_format.py)."""
  import glob
  import os
  from easyrec_tpu.tools import convert_config_format as ccf
  src = sorted(glob.glob(os.path.join(
      os.path.dirname(__file__), '..', 'samples', 'deepfm.config')))[0]
  js = str(tmp_path / 'p.json')
  back = str(tmp_path / 'p.config')
  ccf.main(['--input_config', src, '--output_config', js])
  ccf.main(['--input_config', js, '--output_config', back])
  a = ccf.load_config(src)
  b = ccf.load_config(back)
  assert a == b


def test_convert_rtp_fg_tool(tmp_path):
  """fg.json -> standalone pipeline config (reference
  tools/convert_rtp_fg.py), both from-scratch and --base_config merge."""
  import os
  from easyrec_tpu.tools import convert_rtp_fg as tool
  from easyrec_tpu.config import get_configs_from_pipeline_file
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  fg = os.path.join(repo, 'samples', 'fg', 'taobao_fg.json')
  out = os.path.join(str(tmp_path), 'gen.config')
  tool.main(['--rtp_fg', fg, '--label', 'clk', '--output_path', out])
  cfg = get_configs_from_pipeline_file(out)
  assert list(cfg.data_config.label_fields) == ['clk']
  assert len(cfg.feature_config.features) > 5
  assert cfg.data_config.input_fields[0].input_name == 'clk'

  base = os.path.join(repo, 'samples', 'taobao_fg.config')
  out2 = os.path.join(str(tmp_path), 'merged.config')
  tool.main(['--rtp_fg', fg, '--base_config', base,
             '--output_path', out2])
  cfg2 = get_configs_from_pipeline_file(out2)
  assert not cfg2.fg_json_path            # fully materialized
  assert len(cfg2.feature_config.features) == \
      len(cfg.feature_config.features)
  assert cfg2.model_config.model_class    # model section preserved
