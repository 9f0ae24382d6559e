"""Learnability gates for the families the r2 zoo matrix only smoke-
tested (loss decreases over 5 steps): DAT, PDN, DropoutNet,
CoMetricLearningI2I, RocketLaunching, CMBF, Uniter, MultiTowerRecall,
and the DSSM pointwise / L2-regression variants (VERDICT r2 missing #5).

Each gate asserts within a stated margin of the generator's
Bayes-optimal score (computed in-fixture, same method as
test_learnability.bayes_aucs):
  ltwr — two-tower signal Bern(sigmoid(2.8 * s_u[uid] * s_i[iid])):
         learnable only through a user-embedding x item-embedding
         interaction (a broken tower or similarity formula fails);
  yreg — regression target 2 * s_u[uid] * s_i[iid] + 0.3 N(0,1):
         mean-predictor mse ~4.1, Bayes mse 0.09;
  lpdn — Bern(0.85 if cate in seq_cate else 0.15): PDN's trigger/i2i
         path must read the behavior sequence;
  limg — CROSS-MODAL signal Bern(sigmoid(2.8 * m_i[iid] * s_c[cate]))
         where m_i is visible ONLY in the image vector and s_c only via
         the text cate token — single-modality models cap at AUC 0.5,
         so the gate proves the fusion layers actually fuse.

Reference anchors: examples/readme.md:255-296.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_learnability import _auc_of_probs, _signs  # noqa: E402

from easyrec_tpu.config import get_configs_from_pipeline_file  # noqa: E402
from easyrec_tpu.train.trainer import Trainer  # noqa: E402

N_UID, N_IID, N_CATE = 32, 48, 12
MAX_SEQ = 8
IMG_DIM = 16


def _tables():
  srng = np.random.default_rng(77)
  return {
      's_u': _signs(srng, N_UID),
      's_i': _signs(srng, N_IID),
      'm_i': _signs(srng, N_IID),       # image modality sign per item
      's_c': _signs(srng, N_CATE),
      'img_base': srng.normal(size=IMG_DIM),
  }


def bayes():
  t = _tables()
  out = {}
  twr = 1 / (1 + np.exp(-2.8 * np.outer(t['s_u'], t['s_i']).ravel()))
  out['ltwr'] = _auc_of_probs(twr, np.full(twr.size, 1.0 / twr.size))
  iids = np.arange(N_IID)
  img = 1 / (1 + np.exp(-2.8 * t['m_i'][iids] * t['s_c'][iids % N_CATE]))
  out['limg'] = _auc_of_probs(img, np.full(img.size, 1.0 / img.size))
  ls = np.arange(1, MAX_SEQ + 1)
  pm = float(np.mean(1 - (1 - 1.0 / N_CATE) ** ls))
  out['lpdn'] = _auc_of_probs([0.85, 0.15], [pm, 1 - pm])
  return out


BAYES = bayes()

MARGIN = {
    'two_tower': 0.03,
    'pdn': 0.03,
    'multimodal': 0.04,   # transformer towers converge slower at 250 steps
}


def make_csv(path, n, seed):
  t = _tables()
  rng = np.random.default_rng(seed)
  with open(path, 'w') as f:
    for _ in range(n):
      uid = rng.integers(0, N_UID)
      iid = rng.integers(0, N_IID)
      cate = iid % N_CATE
      L = rng.integers(1, MAX_SEQ + 1)
      seq = rng.integers(0, N_CATE, L)
      p_twr = 1 / (1 + np.exp(-2.8 * t['s_u'][uid] * t['s_i'][iid]))
      p_img = 1 / (1 + np.exp(-2.8 * t['m_i'][iid] * t['s_c'][cate]))
      p_pdn = 0.85 if cate in seq else 0.15
      ltwr = int(rng.random() < p_twr)
      limg = int(rng.random() < p_img)
      lpdn = int(rng.random() < p_pdn)
      yreg = 2.0 * t['s_u'][uid] * t['s_i'][iid] + 0.3 * rng.normal()
      img = t['m_i'][iid] * t['img_base'] + 0.3 * rng.normal(size=IMG_DIM)
      title = 't%d|t%d' % (rng.integers(0, 30), rng.integers(0, 30))
      f.write('%d,%.4f,%d,%d,u%d,i%d,c%d,s%d,%s,%s,%s\n' % (
          ltwr, yreg, lpdn, limg, uid, iid, cate, cate,
          '|'.join('%.3f' % v for v in img), title,
          '|'.join('c%d' % s for s in seq)))


CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: ""
train_config {{
  log_step_count_steps: 100
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: {lr} }} }}
    }}
  }}
  num_steps: {num_steps}
  save_checkpoints_steps: 100000
}}
eval_config {{ {metrics} }}
data_config {{
  batch_size: 256
  label_fields: "{label}"
  input_fields {{ input_name: "ltwr" input_type: FLOAT }}
  input_fields {{ input_name: "yreg" input_type: FLOAT }}
  input_fields {{ input_name: "lpdn" input_type: FLOAT }}
  input_fields {{ input_name: "limg" input_type: FLOAT }}
  input_fields {{ input_name: "uid" input_type: STRING }}
  input_fields {{ input_name: "iid" input_type: STRING }}
  input_fields {{ input_name: "cate" input_type: STRING }}
  input_fields {{ input_name: "sess" input_type: STRING }}
  input_fields {{ input_name: "img_vec" input_type: STRING }}
  input_fields {{ input_name: "title" input_type: STRING }}
  input_fields {{ input_name: "seq_cate" input_type: STRING }}
  input_type: CSVInput
}}
feature_config {{
  features {{ input_names: "uid" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 3000 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
  features {{ input_names: "iid" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 3000 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
  features {{ input_names: "cate" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 1200 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
  features {{ input_names: "img_vec" feature_type: RawFeature
              raw_input_dim: {img_dim} separator: "|" }}
  features {{ input_names: "title" feature_type: TagFeature
              embedding_dim: 8 hash_bucket_size: 200 max_multi_len: 2 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
  features {{ input_names: "seq_cate" feature_type: SequenceFeature
              embedding_dim: 8 hash_bucket_size: 1200 max_seq_len: 8 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
}}
model_config {{
{model_body}
}}
"""

UI_GROUPS = """
  feature_groups {
    group_name: "user" feature_names: "uid" wide_deep: DEEP
  }
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "cate" wide_deep: DEEP
  }
"""

MM_GROUPS = """
  feature_groups {
    group_name: "image" feature_names: "img_vec" wide_deep: DEEP
  }
  feature_groups {
    group_name: "text" feature_names: "cate" feature_names: "title"
    wide_deep: DEEP
  }
"""


def _run(tmp_path, body, label, metrics='metrics_set { auc {} }',
         num_steps=250, lr=0.02, n_train=16384):
  train = os.path.join(str(tmp_path), 'train.csv')
  evalp = os.path.join(str(tmp_path), 'eval.csv')
  make_csv(train, n_train, seed=11)
  make_csv(evalp, 4096, seed=12)
  text = CONFIG.format(train=train, eval=evalp, num_steps=num_steps,
                       metrics=metrics, label=label, lr=lr,
                       img_dim=IMG_DIM, model_body=body)
  path = os.path.join(str(tmp_path), 'pipeline.config')
  with open(path, 'w') as f:
    f.write(text)
  cfg = get_configs_from_pipeline_file(path)
  return Trainer(cfg).fit(checkpoint=False)['eval_metrics']


def _gate_auc(m, bar, name):
  assert m['auc'] > bar, '%s gate: auc=%.4f < %.4f (%s)' % (
      name, m['auc'], bar, m)


DSSM_POINTWISE = UI_GROUPS + """
  model_class: "DSSM"
  dssm {
    user_tower { id: "uid" dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { id: "iid" dnn { hidden_units: [16, 8] use_bn: false } }
    simi_func: INNER_PRODUCT
    scale_simi: true
  }
  loss_type: CLASSIFICATION
"""


def test_dssm_pointwise_two_tower_learned(tmp_path):
  m = _run(tmp_path, DSSM_POINTWISE, 'ltwr')
  _gate_auc(m, BAYES['ltwr'] - MARGIN['two_tower'], 'DSSM pointwise')


DSSM_REG = DSSM_POINTWISE.replace('loss_type: CLASSIFICATION',
                                  'loss_type: L2_LOSS')


def test_dssm_l2_regression_learned(tmp_path):
  # mean-predictor mse ~4.1; Bayes mse = 0.09 (the injected noise)
  m = _run(tmp_path, DSSM_REG, 'yreg',
           metrics='metrics_set { mean_squared_error {} }')
  assert m['mean_squared_error'] < 1.0, \
      'DSSM L2 gate: mse=%.3f (mean-predictor ~4.1, bayes 0.09)' % \
      m['mean_squared_error']


MULTI_TOWER_RECALL = UI_GROUPS + """
  model_class: "MultiTowerRecall"
  multi_tower_recall {
    user_tower { dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { dnn { hidden_units: [16, 8] use_bn: false } }
    final_dnn { hidden_units: [8] use_bn: false }
  }
"""


def test_multi_tower_recall_learned(tmp_path):
  m = _run(tmp_path, MULTI_TOWER_RECALL, 'ltwr')
  _gate_auc(m, BAYES['ltwr'] - MARGIN['two_tower'], 'MultiTowerRecall')


DROPOUTNET = """
  feature_groups {
    group_name: "user_content" feature_names: "uid" wide_deep: DEEP
  }
  feature_groups {
    group_name: "item_content" feature_names: "iid" wide_deep: DEEP
  }
  feature_groups {
    group_name: "item_preference" feature_names: "cate" wide_deep: DEEP
  }
  model_class: "DropoutNet"
  dropoutnet {
    user_content { hidden_units: [16] use_bn: false }
    item_content { hidden_units: [16] use_bn: false }
    item_preference { hidden_units: [8] use_bn: false }
    user_tower { hidden_units: [16] use_bn: false }
    item_tower { hidden_units: [16] use_bn: false }
    softmax_loss { num_negative_samples: 4 }
  }
"""


def test_dropoutnet_two_tower_learned(tmp_path):
  # cosine-similarity logits: AUC is rank-based so the gate transfers;
  # cold-start dropout makes it slightly noisier than plain DSSM
  m = _run(tmp_path, DROPOUTNET, 'ltwr', num_steps=400)
  _gate_auc(m, BAYES['ltwr'] - 2 * MARGIN['two_tower'], 'DropoutNet')


PDN_BODY = UI_GROUPS + """
  feature_groups {
    group_name: "hist" feature_names: "seq_cate" wide_deep: DEEP
  }
  model_class: "PDN"
  pdn {
    user_dnn { hidden_units: [16, 8] use_bn: false }
    item_dnn { hidden_units: [16, 8] use_bn: false }
    u2i_dnn { hidden_units: [8] use_bn: false }
    trigger_dnn { hidden_units: [8, 1] use_bn: false }
    i2i_dnn { hidden_units: [8] use_bn: false }
    sim_dnn { hidden_units: [8, 1] use_bn: false }
    direct_user_dnn { hidden_units: [8] use_bn: false }
    direct_item_dnn { hidden_units: [8] use_bn: false }
    item_id: "iid"
  }
"""


def test_pdn_trigger_path_learned(tmp_path):
  # lpdn depends ONLY on (cate, seq_cate): the direct u*i path is noise,
  # the trigger/i2i path must carry the signal (250 steps reach 0.790 of
  # the 0.792 bar; the additive-hazard link converges slower than a
  # plain sigmoid head)
  m = _run(tmp_path, PDN_BODY, 'lpdn', num_steps=500)
  _gate_auc(m, BAYES['lpdn'] - MARGIN['pdn'], 'PDN')


ROCKET = """
  feature_groups {
    group_name: "all"
    feature_names: "uid" feature_names: "iid" wide_deep: DEEP
  }
  model_class: "RocketLaunching"
  rocket_launching {
    share_dnn { hidden_units: [32] use_bn: false }
    booster_dnn { hidden_units: [32, 16] }
    light_dnn { hidden_units: [16] }
    feature_based_distillation: false
  }
"""


def test_rocket_light_net_learned(tmp_path):
  # eval scores come from the LIGHT net: distillation + own CE must
  # carry the interaction signal through the stop-gradient shared trunk
  m = _run(tmp_path, ROCKET, 'ltwr')
  _gate_auc(m, BAYES['ltwr'] - MARGIN['two_tower'], 'RocketLaunching')


CMBF_BODY = MM_GROUPS + """
  model_class: "CMBF"
  cmbf {
    config {
      multi_head_num: 2
      image_multi_head_num: 2
      text_multi_head_num: 2
      text_head_size: 8
      image_head_size: 8
      image_feature_patch_num: 4
      image_self_attention_layer_num: 1
      text_self_attention_layer_num: 1
      cross_modal_layer_num: 1
    }
    final_dnn { hidden_units: [16] use_bn: false }
  }
"""


def test_cmbf_cross_modal_learned(tmp_path):
  m = _run(tmp_path, CMBF_BODY, 'limg', num_steps=400, lr=0.005)
  _gate_auc(m, BAYES['limg'] - MARGIN['multimodal'], 'CMBF')


UNITER_BODY = MM_GROUPS + """
  model_class: "Uniter"
  uniter {
    config {
      hidden_size: 16
      num_hidden_layers: 1
      num_attention_heads: 2
      intermediate_size: 32
    }
    final_dnn { hidden_units: [16] use_bn: false }
  }
"""


def test_uniter_cross_modal_learned(tmp_path):
  m = _run(tmp_path, UNITER_BODY, 'limg', num_steps=400, lr=0.005)
  _gate_auc(m, BAYES['limg'] - MARGIN['multimodal'], 'Uniter')


CML_BODY = """
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "title" wide_deep: DEEP
  }
  model_class: "CoMetricLearningI2I"
  metric_learning {
    session_id: "sess"
    input: "item"
    dnn { hidden_units: [16, 8] use_bn: false }
    circle_loss { margin: 0.25 gamma: 32 }
    output_l2_normalized_emb: true
  }
"""


def test_cml_i2i_separation_learned(tmp_path):
  # sessions group items of one cate; the item tower sees only iid (+
  # no-signal title tags), so same-cate items must be PULLED together by
  # the circle loss. metric_inputs scores same-session pairs by
  # similarity — a broken pairwise loss leaves AUC at ~0.5.
  m = _run(tmp_path, CML_BODY, 'ltwr')
  assert m['auc'] > 0.90, 'CML separation gate: auc=%.4f' % m['auc']


# ---- DAT: in-batch softmax recall on a fine-grained preference ------
# fixture. The MIND multi-interest fixture is uniform WITHIN an
# interest cate, so a plain two-tower's recall@5 ceiling is ~5/42 (the
# positive ties with every same-interest slot) — only MIND's
# label-guided attention beats that. Here every (user, item) pair has a
# distinct true logit (rank-4 factorization), so the Bayes scorer ranks
# sharply and a correct two-tower must approach it.

N_PU, N_PI, PRANK = 64, 48, 4


def _pref_logits():
  rng = np.random.default_rng(55)
  z = rng.normal(size=(N_PU, PRANK))
  w = rng.normal(size=(N_PI, PRANK))
  return 2.2 * z @ w.T


def _pref_rows(n, seed):
  logits = _pref_logits()
  p = np.exp(logits - logits.max(axis=1, keepdims=True))
  p /= p.sum(axis=1, keepdims=True)
  rng = np.random.default_rng(seed)
  us = rng.integers(0, N_PU, n)
  iids = np.array([rng.choice(N_PI, p=p[u]) for u in us])
  return us, iids


def make_pref_csv(path, n, seed):
  us, iids = _pref_rows(n, seed)
  with open(path, 'w') as f:
    for u, i in zip(us, iids):
      f.write('1,u%d,i%d,c%d\n' % (u, i, i % N_CATE))


def bayes_inbatch_recall(n=2048, seed=32, batch=128, k=5):
  """Ceiling recall@k for an in-batch-softmax-trained scorer under the
  exact metric semantics (metrics.update_topk_recall, eval file order,
  no shuffle, no collision mask for DAT). Two honest corrections vs the
  raw Bayes scorer: (a) in-batch CE's fixed point is the POPULARITY-
  corrected scorer s = logit - log pop (in-batch negatives oversample
  popular items); (b) duplicate in-batch items score near-equal but not
  bit-equal for a LEARNED model, so ties count half instead of riding
  the metric's strict >. Raw-Bayes exact-tie value: 0.570; this ceiling:
  0.422 — DAT measures 0.405-0.423 at convergence (1000 steps)."""
  us, iids = _pref_rows(n, seed)
  logits = _pref_logits()
  p = np.exp(logits - logits.max(axis=1, keepdims=True))
  p /= p.sum(axis=1, keepdims=True)
  s_all = logits - np.log(p.mean(axis=0))[None, :]
  hits = cnt = 0
  for b0 in range(0, n - batch + 1, batch):
    u = us[b0:b0 + batch]
    it = iids[b0:b0 + batch]
    s = s_all[u][:, it]
    pos = np.diag(s)
    rank = (s > pos[:, None]).sum(axis=1) + \
        0.5 * ((s == pos[:, None]).sum(axis=1) - 1)
    hits += int((rank < k).sum())
    cnt += batch
  return hits / cnt


# ---- (legacy comment anchor) ----------------------------------------

DAT_CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: ""
train_config {{
  log_step_count_steps: 100
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.01 }} }}
    }}
  }}
  num_steps: 600
  save_checkpoints_steps: 100000
}}
eval_config {{ metrics_set {{ recall_at_topk {{ topk: 5 }} }} }}
data_config {{
  batch_size: 128
  label_fields: "label"
  input_fields {{ input_name: "label" input_type: FLOAT }}
  input_fields {{ input_name: "uid" input_type: STRING }}
  input_fields {{ input_name: "iid" input_type: STRING }}
  input_fields {{ input_name: "cate" input_type: STRING }}
  input_type: CSVInput
}}
feature_config {{
  features {{ input_names: "uid" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 3000 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
  features {{ input_names: "iid" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 3000 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
  features {{ input_names: "cate" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 600 initializer {{ random_normal_initializer {{ stddev: 0.35 }} }} }}
}}
model_config {{
  model_class: "DAT"
  feature_groups {{
    group_name: "user" feature_names: "uid" wide_deep: DEEP
  }}
  feature_groups {{
    group_name: "item"
    feature_names: "iid" feature_names: "cate" wide_deep: DEEP
  }}
  dat {{
    user_tower {{ id: "uid" dnn {{ hidden_units: [16, 8] use_bn: false }} }}
    item_tower {{ id: "iid" dnn {{ hidden_units: [16, 8] use_bn: false }} }}
    simi_func: INNER_PRODUCT
  }}
  loss_type: SOFTMAX_CROSS_ENTROPY
}}
"""


def test_dat_recall_learned(tmp_path):
  """DAT in-batch softmax recall@5 within margin of the true scorer's
  recall under the same metric (random floor 5/128 ~= 0.04)."""
  train = os.path.join(str(tmp_path), 'train.csv')
  evalp = os.path.join(str(tmp_path), 'eval.csv')
  make_pref_csv(train, 16384, seed=31)
  make_pref_csv(evalp, 2048, seed=32)
  text = DAT_CONFIG.format(train=train, eval=evalp)
  path = os.path.join(str(tmp_path), 'pipeline.config')
  with open(path, 'w') as f:
    f.write(text)
  cfg = get_configs_from_pipeline_file(path)
  m = Trainer(cfg).fit(checkpoint=False)['eval_metrics']
  bar = bayes_inbatch_recall() - 0.06
  assert m['recall@5'] > bar, \
      'DAT recall gate: %.4f < ceiling %.4f - 0.06' % (
          m['recall@5'], bayes_inbatch_recall())


GROUP_SEQ_MMOE = """
  model_class: "MMoE"
  feature_groups {
    group_name: "all"
    feature_names: "uid" feature_names: "cate"
    wide_deep: DEEP
    sequence_features {
      group_name: "seq_fea"
      seq_dnn { hidden_units: [32, 16, 1] }
      seq_att_map { key: "cate" hist_seq: "seq_cate" }
    }
  }
  mmoe {
    expert_dnn { hidden_units: [32, 16] use_bn: false }
    num_expert: 2
    task_towers {
      tower_name: "ctr" label_name: "lpdn"
      dnn { hidden_units: [16] use_bn: false } num_class: 1
      loss_type: CLASSIFICATION weight: 1.0
      metrics_set { auc {} }
    }
  }
"""


def test_group_seq_attention_learned(tmp_path):
  """Group-level sequence_features gate: lpdn = Bern(0.85 if cate in
  seq_cate else 0.15) is learnable only if the DIN attention inside the
  feature group actually attends the history against the cate key
  (models/seq_input.py; reference input_layer + sequence_feature_layer).
  """
  m = _run(tmp_path, GROUP_SEQ_MMOE, 'lpdn')
  _gate_auc(m, BAYES['lpdn'] - MARGIN['pdn'], 'group-seq-attention')
