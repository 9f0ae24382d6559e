"""Negative samplers: alias-method weighting, batch splice, DSSM list-wise
training with sampled + hard negatives, recall@k metrics.

Mirrors the reference sampler behavior (easy_rec/python/core/sampler.py)
without the GraphLearn service.
"""

import os

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.data import samplers
from easyrec_tpu.train.trainer import Trainer

N_ITEMS = 60
N_CATES = 6


def _write_items(path):
  rng = np.random.default_rng(3)
  weights = rng.random(N_ITEMS) + 0.1
  with open(path, 'w') as f:
    f.write('id:int64\tweight:float\tfeature:string\n')   # GL-style header
    for i in range(N_ITEMS):
      f.write('i%d\t%.4f\ti%d:c%d\n' % (i, weights[i], i, i % N_CATES))
  return weights


def _write_interactions(path, n, seed):
  """User u prefers items whose cate == u % N_CATES (all positives)."""
  rng = np.random.default_rng(seed)
  with open(path, 'w') as f:
    for _ in range(n):
      u = rng.integers(0, 40)
      cate = u % N_CATES
      matching = [i for i in range(N_ITEMS) if i % N_CATES == cate]
      item = matching[rng.integers(0, len(matching))]
      f.write('1,u%d,i%d,c%d\n' % (u, item, item % N_CATES))


CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
  log_step_count_steps: 50
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.01 }} }}
    }}
  }}
  num_steps: {num_steps}
  save_checkpoints_steps: 1000
}}
eval_config {{
  metrics_set {{ recall_at_topk {{ topk: 5 }} }}
  metrics_set {{ auc {{}} }}
}}
data_config {{
  batch_size: 64
  label_fields: "label"
  input_fields {{ input_name: "label" input_type: FLOAT }}
  input_fields {{ input_name: "uid" input_type: STRING }}
  input_fields {{ input_name: "iid" input_type: STRING }}
  input_fields {{ input_name: "cate" input_type: STRING }}
  input_type: CSVInput
  {sampler}
}}
feature_config {{
  features {{ input_names: "uid" feature_type: IdFeature
              embedding_dim: 16 hash_bucket_size: 100 }}
  features {{ input_names: "iid" feature_type: IdFeature
              embedding_dim: 16 hash_bucket_size: 200 }}
  features {{ input_names: "cate" feature_type: IdFeature
              embedding_dim: 16 hash_bucket_size: 20 }}
}}
model_config {{
  model_class: "DSSM"
  feature_groups {{
    group_name: "user" feature_names: "uid" wide_deep: DEEP
  }}
  feature_groups {{
    group_name: "item" feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
  }}
  dssm {{
    user_tower {{ id: "uid" dnn {{ hidden_units: 16 use_bn: false }} }}
    item_tower {{ id: "iid" dnn {{ hidden_units: 16 use_bn: false }} }}
    simi_func: INNER_PRODUCT
    temperature: 0.2
    item_id: "iid"
  }}
  loss_type: SOFTMAX_CROSS_ENTROPY
}}
"""

NEG_SAMPLER = """
  negative_sampler {{
    input_path: "{items}"
    num_sample: 16
    attr_fields: "iid"
    attr_fields: "cate"
    item_id_field: "iid"
  }}
"""

HARD_SAMPLER = """
  hard_negative_sampler {{
    user_input_path: "{items}"
    item_input_path: "{items}"
    hard_neg_edge_input_path: "{edges}"
    num_sample: 8
    num_hard_sample: 2
    attr_fields: "iid"
    attr_fields: "cate"
    item_id_field: "iid"
    user_id_field: "uid"
  }}
"""


def _setup(tmp_path, sampler_tpl, num_steps=150, **extra):
  items = os.path.join(str(tmp_path), 'items.txt')
  train = os.path.join(str(tmp_path), 'train.csv')
  evalp = os.path.join(str(tmp_path), 'eval.csv')
  _write_items(items)
  _write_interactions(train, 4096, seed=1)
  _write_interactions(evalp, 512, seed=2)
  text = CONFIG.format(
      train=train, eval=evalp,
      model_dir=os.path.join(str(tmp_path), 'ckpt'),
      num_steps=num_steps,
      sampler=sampler_tpl.format(items=items, **extra))
  path = os.path.join(str(tmp_path), 'pipeline.config')
  with open(path, 'w') as f:
    f.write(text)
  return path


def test_alias_sampler_distribution():
  rng = np.random.default_rng(0)
  w = np.array([1.0, 2.0, 4.0, 8.0])
  s = samplers.AliasSampler(w)
  draws = s.draw(rng, 60000)
  freq = np.bincount(draws, minlength=4) / 60000
  np.testing.assert_allclose(freq, w / w.sum(), atol=0.02)


def test_negative_sampler_batch_splice(tmp_path):
  cfg = get_configs_from_pipeline_file(_setup(tmp_path, NEG_SAMPLER))
  trainer = Trainer(cfg)
  batch = next(iter(trainer.train_input()))
  assert batch['neg.feat.iid.ids'].shape == (16, 1)
  assert batch['neg.feat.cate.ids'].shape == (16, 1)
  assert 'neg.feat.uid.ids' not in batch
  # exclusion works on the RAW ids (bucket ids may collide after hashing)
  sampler = samplers.build(cfg.data_config)
  exclude = ['i%d' % i for i in range(30)]
  for _ in range(5):
    cols = sampler.sample(batch_item_ids=np.array(exclude, dtype=object))
    overlap = set(cols['iid'].tolist()) & set(exclude)
    assert len(overlap) <= 1, overlap   # bounded rejection: ~0 leftovers


def test_dssm_with_negatives_learns(tmp_path):
  cfg = get_configs_from_pipeline_file(_setup(tmp_path, NEG_SAMPLER))
  trainer = Trainer(cfg)
  result = trainer.fit()
  hist = result['history']
  assert hist[-1]['loss'] < hist[0]['loss']
  # users prefer a cate: recall@5 against 16 sampled negatives must beat
  # the 5/17 random baseline by a wide margin
  assert result['eval_metrics']['recall@5'] > 0.55, result['eval_metrics']


SEQ_ATT_CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.01 }} }}
    }}
  }}
  num_steps: 150
  save_checkpoints_steps: 1000
}}
eval_config {{
  metrics_set {{ recall_at_topk {{ topk: 5 }} }}
}}
data_config {{
  batch_size: 64
  label_fields: "label"
  input_fields {{ input_name: "label" input_type: FLOAT }}
  input_fields {{ input_name: "uid" input_type: STRING }}
  input_fields {{ input_name: "iid" input_type: STRING }}
  input_fields {{ input_name: "cate" input_type: STRING }}
  input_fields {{ input_name: "seq_cate" input_type: STRING }}
  input_type: CSVInput
  negative_sampler {{
    input_path: "{items}"
    num_sample: 16
    attr_fields: "iid"
    attr_fields: "cate"
    item_id_field: "iid"
  }}
}}
feature_config {{
  features {{ input_names: "uid" feature_type: IdFeature
              embedding_dim: 16 hash_bucket_size: 100 }}
  features {{ input_names: "iid" feature_type: IdFeature
              embedding_dim: 16 hash_bucket_size: 200 }}
  features {{ input_names: "cate" feature_type: IdFeature
              embedding_dim: 16 hash_bucket_size: 20 }}
  features {{ input_names: "seq_cate" feature_type: SequenceFeature
              embedding_dim: 16 hash_bucket_size: 20 max_seq_len: 5 }}
}}
model_config {{
  model_class: "DSSM"
  feature_groups {{
    group_name: "user" feature_names: "uid" wide_deep: DEEP
  }}
  feature_groups {{
    group_name: "item" feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
  }}
  seq_att_groups {{
    group_name: "din"
    seq_att_map {{ key: "cate" hist_seq: "seq_cate" }}
  }}
  dssm {{
    user_tower {{ id: "uid" dnn {{ hidden_units: 16 use_bn: false }} }}
    item_tower {{ id: "iid" dnn {{ hidden_units: 16 use_bn: false }} }}
    simi_func: INNER_PRODUCT
    temperature: 0.2
    item_id: "iid"
  }}
  loss_type: SOFTMAX_CROSS_ENTROPY
}}
"""


def _write_seq_interactions(path, n, seed):
  """Like _write_interactions but with a history column of the user's
  preferred cate (the DIN signal)."""
  rng = np.random.default_rng(seed)
  with open(path, 'w') as f:
    for _ in range(n):
      u = rng.integers(0, 40)
      cate = u % N_CATES
      matching = [i for i in range(N_ITEMS) if i % N_CATES == cate]
      item = matching[rng.integers(0, len(matching))]
      hist = '|'.join('c%d' % cate for _ in range(rng.integers(2, 6)))
      f.write('1,u%d,i%d,c%d,%s\n' % (u, item, item % N_CATES, hist))


def test_dssm_negative_sampler_target_attention(tmp_path):
  """seq_att_groups on a two-tower model: DIN target attention queried by
  the positive item AND by every sampled negative (per-candidate user
  towers, reference sequence_feature_layer negative-sampler re-query)."""
  items = os.path.join(str(tmp_path), 'items.txt')
  train = os.path.join(str(tmp_path), 'train.csv')
  evalp = os.path.join(str(tmp_path), 'eval.csv')
  _write_items(items)
  _write_seq_interactions(train, 4096, seed=1)
  _write_seq_interactions(evalp, 512, seed=2)
  path = os.path.join(str(tmp_path), 'pipeline.config')
  with open(path, 'w') as f:
    f.write(SEQ_ATT_CONFIG.format(
        train=train, eval=evalp,
        model_dir=os.path.join(str(tmp_path), 'ckpt'), items=items))
  cfg = get_configs_from_pipeline_file(path)
  trainer = Trainer(cfg)
  result = trainer.fit()
  # the attention module exists and is shared between pos/neg queries
  params = result['state'].params
  assert 'seq_att_0' in params, sorted(params)
  hist = result['history']
  assert hist[-1]['loss'] < hist[0]['loss']
  # positive is col 0 of [pos | 16 negs]: recall@5 must beat 5/17 random
  assert result['eval_metrics']['recall@5'] > 0.55, result['eval_metrics']


def test_hard_negative_sampler(tmp_path):
  edges = os.path.join(str(tmp_path), 'hard_edges.txt')
  with open(edges, 'w') as f:
    rng = np.random.default_rng(5)
    for u in range(40):
      for i in rng.integers(0, N_ITEMS, 3):
        f.write('u%d\ti%d\t1.0\n' % (u, i))
  cfg = get_configs_from_pipeline_file(
      _setup(tmp_path, HARD_SAMPLER, num_steps=30, edges=edges))
  trainer = Trainer(cfg)
  batch = next(iter(trainer.train_input()))
  assert batch['hard_neg.feat.iid.ids'].shape == (64 * 2, 1)
  assert batch['hard_neg_mask'].shape == (64, 2)
  assert batch['hard_neg_mask'].sum() > 0
  result = trainer.fit()
  assert result['global_step'] == 30
  assert np.isfinite(result['eval_metrics']['loss'])
