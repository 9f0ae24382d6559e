"""TensorBoard event writer: proto wire-format roundtrip + trainer wiring
(events written under model_dir and model_dir/eval_val)."""

import glob
import os

import numpy as np

from easyrec_tpu.config import get_configs_from_pipeline_str
from easyrec_tpu.train.trainer import Trainer
from easyrec_tpu.utils.summary_writer import SummaryWriter, iter_events

CONFIG = """
train_input_path: "synthetic"
eval_input_path: "synthetic"
model_dir: "{model_dir}"
train_config {{
  log_step_count_steps: 2
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.01 }} }}
    }}
  }}
  num_steps: 6
  save_checkpoints_steps: 100
}}
eval_config {{ metrics_set {{ auc {{}} }} }}
data_config {{
  batch_size: 32
  label_fields: "clk"
  input_fields {{ input_name: "clk" input_type: FLOAT }}
  input_fields {{ input_name: "uid" input_type: STRING }}
  input_fields {{ input_name: "iid" input_type: STRING }}
  input_type: DummyInput
}}
feature_config {{
  features {{ input_names: "uid" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 100 }}
  features {{ input_names: "iid" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 100 }}
}}
model_config {{
  model_class: "DeepFM"
  feature_groups {{
    group_name: "deep" feature_names: "uid" feature_names: "iid"
    wide_deep: WIDE_AND_DEEP
  }}
  deepfm {{
    dnn {{ hidden_units: [8] use_bn: false }}
    final_dnn {{ hidden_units: [8] use_bn: false }}
  }}
}}
"""


def test_writer_roundtrip(tmp_path):
  logdir = str(tmp_path / 'logs')
  with SummaryWriter(logdir) as w:
    w.add_scalar('loss/total', 0.75, step=10)
    w.add_scalars({'auc': 0.625, 'gauc': 0.5}, step=20)
  files = glob.glob(os.path.join(logdir, 'events.out.tfevents.*'))
  assert len(files) == 1
  events = list(iter_events(files[0]))
  assert events[0] == (10, {'loss/total': 0.75})
  step, scalars = events[1]
  assert step == 20
  np.testing.assert_allclose(scalars['auc'], 0.625)
  np.testing.assert_allclose(scalars['gauc'], 0.5)


def test_trainer_writes_events(tmp_path):
  cfg = get_configs_from_pipeline_str(
      CONFIG.format(model_dir=str(tmp_path / 'ckpt')))
  result = Trainer(cfg).fit()
  assert result['global_step'] == 6
  train_files = glob.glob(
      os.path.join(str(tmp_path / 'ckpt'), 'events.out.tfevents.*'))
  assert len(train_files) == 1
  tags = set()
  steps = set()
  for step, scalars in iter_events(train_files[0]):
    steps.add(step)
    tags.update(scalars)
  assert 'loss/total_loss' in tags
  assert 'global_step/examples_per_sec' in tags
  assert {2, 4, 6} <= steps
  eval_files = glob.glob(
      os.path.join(str(tmp_path / 'ckpt'), 'eval_val',
                   'events.out.tfevents.*'))
  assert len(eval_files) == 1
  ev = dict(e for e in iter_events(eval_files[0]))
  assert 'auc' in ev[6]
