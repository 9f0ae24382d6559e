"""Synthetic dataset generators shaped like the reference's test fixtures
(EasyRec data/test/*): tiny learnable CSVs so end-to-end train+eval tests
can assert real learning (AUC well above 0.5) in seconds."""

import os

import numpy as np

CRITEO_LIKE_CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
  log_step_count_steps: 20
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.005 }} }}
    }}
  }}
  num_steps: {num_steps}
  save_checkpoints_steps: 500
}}
eval_config {{ metrics_set {{ auc {{}} }} }}
data_config {{
  batch_size: {batch_size}
  num_epochs: {num_epochs}
  label_fields: "label"
  prefetch_size: 4
  input_fields {{ input_name: "label" input_type: FLOAT }}
  input_fields {{ input_name: "d1" input_type: FLOAT }}
  input_fields {{ input_name: "d2" input_type: FLOAT }}
  input_fields {{ input_name: "c1" input_type: STRING }}
  input_fields {{ input_name: "c2" input_type: STRING }}
  input_fields {{ input_name: "c3" input_type: STRING }}
  input_type: CSVInput
}}
feature_config {{
  features {{ input_names: "d1" feature_type: RawFeature
              embedding_dim: 8 min_val: 0.0 max_val: 1.0 }}
  features {{ input_names: "d2" feature_type: RawFeature
              embedding_dim: 8 min_val: 0.0 max_val: 1.0 }}
  features {{ input_names: "c1" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 200 }}
  features {{ input_names: "c2" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 200 }}
  features {{ input_names: "c3" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 200 }}
}}
model_config {{
  model_class: "{model_class}"
  {model_body}
}}
"""

DEEPFM_BODY = """
  feature_groups {
    group_name: "deep"
    feature_names: "d1" feature_names: "d2"
    feature_names: "c1" feature_names: "c2" feature_names: "c3"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "wide"
    feature_names: "c1" feature_names: "c2" feature_names: "c3"
    wide_deep: WIDE
  }
  deepfm {
    dnn { hidden_units: [32, 16] use_bn: false }
    final_dnn { hidden_units: [16] use_bn: false }
  }
  embedding_regularization: 1e-6
"""


def make_binary_csv(path: str, n: int, seed: int = 0) -> None:
  """Learnable CTR-ish data: label depends on id buckets + dense values."""
  rng = np.random.default_rng(seed)
  c1 = rng.integers(0, 50, n)
  c2 = rng.integers(0, 30, n)
  c3 = rng.integers(0, 20, n)
  d1 = rng.random(n)
  d2 = rng.random(n)
  score = (0.5 * (c1 % 7) - 1.2 * (c2 % 3) + 0.8 * (c3 % 5)
           + 3.0 * d1 - 2.5 * d2 - 1.8)
  prob = 1.0 / (1.0 + np.exp(-score))
  label = (rng.random(n) < prob).astype(np.int32)
  with open(path, 'w') as f:
    for i in range(n):
      f.write('%d,%.4f,%.4f,u%d,v%d,w%d\n' %
              (label[i], d1[i], d2[i], c1[i], c2[i], c3[i]))


def write_pipeline(tmpdir, model_class='DeepFM', model_body=DEEPFM_BODY,
                   n_train=4096, n_eval=1024, num_steps=200,
                   batch_size=256, num_epochs=0, extra=''):
  tmpdir = str(tmpdir)
  train = os.path.join(tmpdir, 'train.csv')
  evalp = os.path.join(tmpdir, 'eval.csv')
  make_binary_csv(train, n_train, seed=1)
  make_binary_csv(evalp, n_eval, seed=2)
  text = CRITEO_LIKE_CONFIG.format(
      train=train, eval=evalp, model_dir=os.path.join(tmpdir, 'ckpt'),
      num_steps=num_steps, batch_size=batch_size, num_epochs=num_epochs,
      model_class=model_class, model_body=model_body) + extra
  path = os.path.join(tmpdir, 'pipeline.config')
  with open(path, 'w') as f:
    f.write(text)
  return path


def extra_label_and(label_dict):
  """Test extra_label_func: conjunction of 'label' with d>threshold proxy
  (here simply label * label, exercising the derived-label path)."""
  base = label_dict['label']
  return base * base
