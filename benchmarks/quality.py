"""Quality-parity harness: trains the BASELINE.md config set on the real
public datasets and prints AUC against the reference anchors
(/root/reference/examples/readme.md:255-296; tolerances in BASELINE.md).

The datasets are NOT in this image (the reference ships download scripts
only) — the harness detects what is present under --data_dir and SKIPS
cleanly otherwise, so it is ready to run the moment data appears:

  data_dir/
    criteo/train.txt            raw Kaggle Criteo Display Advertising
                                (label \t I1..I13 \t C1..C26), OR
    criteo/criteo_train_data + criteo_test_data  (pre-split TSV)
    ml-1m/{users,movies,ratings}.dat              MovieLens-1M
    books/book_train.txt + book_test.txt          Amazon Books (uid,bid,t)

Preprocessing mirrors the reference protocol exactly (same splits, label
rules, sequence construction — examples/data/*/process_*.py) so the AUC
anchors are comparable:
  criteo: chronological 90/10 split of train.txt; raw I columns min/max
          normalized (bounds computed from the train split).
  ml-1m:  label = 1 (rating>=4) / 0 (rating<=2), rating 3 dropped,
          seeded shuffle, first 665110 rows train.
  books:  per-user chronological history expansion, 4 random negatives
          per positive, max history 50 (already in book_train/test).

Run:  python benchmarks/quality.py --data_dir <dir> [--models deepfm,...]
      [--smoke]  (tiny step cap: exercises the plumbing without data-scale
                  training; AUC lines are then informational only)
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import random
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

# anchor AUCs (examples/readme.md:255-296; BASELINE.md)
ANCHORS = {
    'fm_on_criteo': 0.7577,
    'deepfm_on_criteo': 0.7970,       # north-star: ±0.001
    'dlrm_on_criteo': 0.79785,
    'mlp_on_movielens': 0.8616,
    'wide_and_deep_on_movielens': 0.8558,
    'deepfm_on_movielens': 0.8867,
    'dcn_on_movielens': 0.8576,
    'autoint_on_movielens': 0.8513,
    'masknet_on_movielens': 0.8872,
    'fibinet_on_movielens': 0.8893,
    'dssm_on_books': 0.8173,
    'mind_on_books': 0.7511,
}
NORTH_STAR_TOL = 0.001
TOL = 0.005      # non-north-star: informational band


# ------------------------------------------------------------- criteo

def prepare_criteo(src_dir: str, work: str):
  """Returns (train_path, eval_path, minmax[13]) or None if data absent."""
  pre_tr = os.path.join(src_dir, 'criteo_train_data')
  pre_te = os.path.join(src_dir, 'criteo_test_data')
  raw = os.path.join(src_dir, 'train.txt')
  os.makedirs(work, exist_ok=True)
  stats_path = os.path.join(work, 'criteo_stats.json')
  if os.path.exists(pre_tr) and os.path.exists(pre_te):
    tr, te = pre_tr, pre_te
  elif os.path.exists(raw):
    tr = os.path.join(work, 'criteo_train_data')
    te = os.path.join(work, 'criteo_test_data')
    if not (os.path.exists(tr) and os.path.exists(te)):
      n = sum(1 for _ in open(raw, 'rb'))
      cut = int(round(n * 0.9))        # chronological 90/10 (reference)
      with open(raw) as fin, open(tr, 'w') as ftr, open(te, 'w') as fte:
        for i, line in enumerate(fin):
          (ftr if i < cut else fte).write(line)
  else:
    return None
  if os.path.exists(stats_path):
    mm = json.load(open(stats_path))
  else:
    lo = np.full(13, np.inf)
    hi = np.full(13, -np.inf)
    with open(tr) as f:
      for line in f:
        parts = line.rstrip('\n').split('\t')
        for j in range(13):
          v = parts[1 + j]
          if v:
            x = float(v)
            lo[j] = min(lo[j], x)
            hi[j] = max(hi[j], x)
    mm = {'min': lo.tolist(), 'max': hi.tolist()}
    json.dump(mm, open(stats_path, 'w'))
  return tr, te, mm


def criteo_config(model: str, tr: str, te: str, mm, model_dir: str,
                  num_steps: int = 0) -> str:
  fields = ['input_fields { input_name: "label" input_type: FLOAT '
            'default_val: "0" }']
  feats = []
  for j in range(13):
    fields.append('input_fields { input_name: "I%d" input_type: FLOAT '
                  'default_val: "0" }' % (j + 1))
    feats.append(
        'features { input_names: "I%d" feature_type: RawFeature '
        'embedding_dim: 16 min_val: %s max_val: %s }'
        % (j + 1, mm['min'][j], mm['max'][j]))
  for j in range(26):
    fields.append('input_fields { input_name: "C%d" input_type: STRING }'
                  % (j + 1))
    feats.append(
        'features { input_names: "C%d" feature_type: IdFeature '
        'embedding_dim: 16 hash_bucket_size: 1000000 }' % (j + 1))
  deep = ' '.join('feature_names: "%s"' % n for n in
                  ['I%d' % (j + 1) for j in range(13)] +
                  ['C%d' % (j + 1) for j in range(26)])
  wide = ' '.join('feature_names: "C%d"' % (j + 1) for j in range(26))
  dense = ' '.join('feature_names: "I%d"' % (j + 1) for j in range(13))
  sparse = ' '.join('feature_names: "C%d"' % (j + 1) for j in range(26))
  if model == 'deepfm':
    body = """
  model_class: "DeepFM"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  feature_groups { group_name: "wide" %s wide_deep: WIDE }
  deepfm {
    dnn { hidden_units: [256, 128, 64] }
    final_dnn { hidden_units: [256, 128, 64] }
    wide_regularization: 1e-4
  }
  embedding_regularization: 1e-5
""" % (deep, wide)
  elif model == 'fm':
    body = """
  model_class: "FM"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  feature_groups { group_name: "wide" %s wide_deep: WIDE }
  fm {}
  embedding_regularization: 1e-5
""" % (deep, wide)
  elif model == 'dlrm':
    body = """
  model_class: "DLRM"
  feature_groups { group_name: "dense" %s wide_deep: DEEP }
  feature_groups { group_name: "sparse" %s wide_deep: DEEP }
  dlrm {
    bot_dnn { hidden_units: [64, 32, 16] }
    top_dnn { hidden_units: [256, 128, 64] }
  }
  embedding_regularization: 1e-5
""" % (dense, sparse)
  else:
    raise KeyError(model)
  return """
train_input_path: "%s"
eval_input_path: "%s"
model_dir: "%s"
train_config {
  log_step_count_steps: 500
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
  save_checkpoints_steps: 20000
  num_steps: %d
}
eval_config { metrics_set { auc {} } }
data_config {
  separator: "\\t"
  batch_size: 4096
  num_epochs: 1
  label_fields: "label"
  %s
  input_type: CSVInput
}
feature_config {
  %s
}
model_config {
%s
}
""" % (tr, te, model_dir, num_steps, '\n  '.join(fields),
       '\n  '.join(feats), body)


# ----------------------------------------------------------- movielens

ML_COLS = ['label', 'user_id', 'movie_id', 'rating', 'gender', 'age',
           'job_id', 'zip_id', 'title', 'genres', 'year']


def prepare_movielens(src_dir: str, work: str):
  """ml-1m .dat files -> reference-protocol train/test TSVs."""
  pre_tr = os.path.join(src_dir, 'movies_train_data')
  pre_te = os.path.join(src_dir, 'movies_test_data')
  if os.path.exists(pre_tr) and os.path.exists(pre_te):
    return pre_tr, pre_te
  needed = [os.path.join(src_dir, f)
            for f in ('users.dat', 'movies.dat', 'ratings.dat')]
  if not all(os.path.exists(p) for p in needed):
    return None
  tr = os.path.join(work, 'movies_train_data')
  te = os.path.join(work, 'movies_test_data')
  if os.path.exists(tr) and os.path.exists(te):
    return tr, te
  os.makedirs(work, exist_ok=True)
  users = {}
  ages = {}
  with open(needed[0], encoding='ISO-8859-1') as f:
    for line in f:
      uid, gender, age, job, zipc = line.rstrip('\n').split('::')
      if age not in ages:
        ages[age] = len(ages)
      users[uid] = (('0' if gender == 'F' else '1'), str(ages[age]),
                    job, zipc)
  movies = {}
  pat = re.compile(r'^(.*)\((\d+)\)$')
  with open(needed[1], encoding='ISO-8859-1') as f:
    for line in f:
      mid, title, genres = line.rstrip('\n').split('::')
      m = pat.match(title)
      name, year = (m.group(1), m.group(2)) if m else (title, '0')
      movies[mid] = (name.strip(), genres, year)
  rows = []
  with open(needed[2], encoding='ISO-8859-1') as f:
    for line in f:
      uid, mid, rating, _ts = line.rstrip('\n').split('::')
      r = int(rating)
      if r == 3:
        continue                       # reference drops rating == 3
      label = '1' if r >= 4 else '0'
      u = users[uid]
      mv = movies[mid]
      rows.append('\t'.join([label, uid, mid, rating, u[0], u[1], u[2],
                             u[3], mv[0], mv[1], mv[2]]))
  rng = random.Random(2025)            # reference shuffles (unseeded)
  rng.shuffle(rows)
  cut = 665110                         # reference split point
  with open(tr, 'w') as f:
    f.write('\n'.join(rows[:cut]) + '\n')
  with open(te, 'w') as f:
    f.write('\n'.join(rows[cut:]) + '\n')
  return tr, te


def movielens_config(model: str, tr: str, te: str, model_dir: str,
                     num_steps: int = 2500) -> str:
  fields = []
  for name, typ in [('label', 'FLOAT'), ('user_id', 'STRING'),
                    ('movie_id', 'STRING'), ('rating', 'FLOAT'),
                    ('gender', 'STRING'), ('age', 'STRING'),
                    ('job_id', 'STRING'), ('zip_id', 'STRING'),
                    ('title', 'STRING'), ('genres', 'STRING'),
                    ('year', 'STRING')]:
    fields.append('input_fields { input_name: "%s" input_type: %s }'
                  % (name, typ))
  feats = """
  features { input_names: "user_id" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 12000 }
  features { input_names: "movie_id" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 6000 }
  features { input_names: "gender" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 10 }
  features { input_names: "age" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 10 }
  features { input_names: "job_id" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 30 }
  features { input_names: "zip_id" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 5000 }
  features { input_names: "genres" feature_type: TagFeature
             separator: "|" embedding_dim: 16 hash_bucket_size: 100
             max_multi_len: 8 }
  features { input_names: "title" feature_type: SequenceFeature
             separator: " " embedding_dim: 16 hash_bucket_size: 10000
             max_seq_len: 16 }
  features { input_names: "year" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 100 }
"""
  all_feats = ('feature_names: "user_id" feature_names: "movie_id" '
               'feature_names: "gender" feature_names: "age" '
               'feature_names: "job_id" feature_names: "zip_id" '
               'feature_names: "genres" feature_names: "title" '
               'feature_names: "year"')
  id_feats = ('feature_names: "user_id" feature_names: "movie_id" '
              'feature_names: "gender" feature_names: "age" '
              'feature_names: "job_id" feature_names: "year"')
  if model == 'deepfm':
    body = """
  model_class: "DeepFM"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  feature_groups { group_name: "wide" %s wide_deep: WIDE }
  deepfm {
    dnn { hidden_units: [256, 128, 64] }
    final_dnn { hidden_units: [128, 64] }
  }
  embedding_regularization: 1e-5
""" % (all_feats, id_feats)
  elif model == 'wide_and_deep':
    body = """
  model_class: "WideAndDeep"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  feature_groups { group_name: "wide" %s wide_deep: WIDE }
  wide_and_deep {
    dnn { hidden_units: [256, 128, 64] }
    final_dnn { hidden_units: [64] }
  }
  embedding_regularization: 1e-5
""" % (all_feats, id_feats)
  elif model == 'mlp':
    body = """
  model_class: "RankModel"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  backbone {
    blocks {
      name: "feat"
      inputs { feature_group_name: "deep" }
      input_layer {}
    }
    top_mlp { hidden_units: [256, 128, 64] }
  }
  embedding_regularization: 1e-5
""" % all_feats
  elif model == 'dcn':
    body = """
  model_class: "DCN"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  dcn {
    deep_tower { input: "deep" dnn { hidden_units: [256, 128, 64] } }
    cross_tower { input: "deep" cross_num: 3 }
    final_dnn { hidden_units: [128, 64] }
  }
  embedding_regularization: 1e-5
""" % all_feats
  elif model == 'autoint':
    body = """
  model_class: "AutoInt"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  autoint {
    multi_head_num: 2
    multi_head_size: 24
    interacting_layer_num: 3
    final_dnn { hidden_units: [128, 64] }
  }
  embedding_regularization: 1e-5
""" % all_feats
  elif model == 'masknet':
    body = """
  model_class: "RankModel"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  backbone {
    blocks {
      name: "feat"
      inputs { feature_group_name: "deep" }
      input_layer { do_layer_norm: true }
    }
    blocks {
      name: "masknet"
      inputs { block_name: "feat" }
      keras_layer {
        class_name: "MaskNet"
        masknet {
          mask_blocks { output_size: 512 reduction_factor: 2.0 }
          mask_blocks { output_size: 512 reduction_factor: 2.0 }
          mask_blocks { output_size: 512 reduction_factor: 2.0 }
          mlp { hidden_units: [256, 64] }
        }
      }
    }
    top_mlp { hidden_units: [64, 32] }
  }
  embedding_regularization: 1e-5
""" % all_feats
  elif model == 'fibinet':
    body = """
  model_class: "RankModel"
  feature_groups { group_name: "deep" %s wide_deep: DEEP }
  backbone {
    blocks {
      name: "feat"
      inputs { feature_group_name: "deep" }
      input_layer { only_output_3d_tensor: true }
    }
    blocks {
      name: "fibinet"
      inputs { block_name: "feat" }
      keras_layer {
        class_name: "FiBiNet"
        fibinet {
          senet { reduction_ratio: 4 }
          bilinear { type: "each" num_output_units: 512 }
          mlp { hidden_units: [512, 256] }
        }
      }
    }
    top_mlp { hidden_units: [128, 64] }
  }
  embedding_regularization: 1e-5
""" % all_feats
  else:
    raise KeyError(model)
  return """
train_input_path: "%s"
eval_input_path: "%s"
model_dir: "%s"
train_config {
  log_step_count_steps: 200
  optimizer_config {
    adam_optimizer {
      learning_rate { constant_learning_rate { learning_rate: 0.001 } }
    }
  }
  save_checkpoints_steps: 10000
  num_steps: %d
}
eval_config { metrics_set { auc {} } }
data_config {
  separator: "\\t"
  batch_size: 1024
  num_epochs: 1
  label_fields: "label"
  %s
  input_type: CSVInput
}
feature_config {
%s
}
model_config {
%s
}
""" % (tr, te, model_dir, num_steps, '\n  '.join(fields), feats, body)


# ----------------------------------------------------------- books

def prepare_books(src_dir: str, work: str):
  pre_tr = os.path.join(src_dir, 'amazon_train_data')
  pre_te = os.path.join(src_dir, 'amazon_test_data')
  if os.path.exists(pre_tr) and os.path.exists(pre_te):
    return pre_tr, pre_te
  raw_tr = os.path.join(src_dir, 'book_train.txt')
  raw_te = os.path.join(src_dir, 'book_test.txt')
  if not (os.path.exists(raw_tr) and os.path.exists(raw_te)):
    return None
  os.makedirs(work, exist_ok=True)
  tr = os.path.join(work, 'amazon_train_data')
  te = os.path.join(work, 'amazon_test_data')
  if os.path.exists(tr) and os.path.exists(te):
    return tr, te
  rng = random.Random(2025)
  MAX_BOOK = 367982                    # reference id range

  def expand(src, dst, negs=4):
    """Per-user history expansion + random negatives (reference
    process_amazon.py): rows are (user, hist|..., item, label) TSV."""
    by_user = {}
    with open(src) as f:
      for line in f:
        u, b, _t = line.rstrip('\n').split(',')
        by_user.setdefault(u, []).append(b)
    with open(dst, 'w') as out:
      for u, pos in by_user.items():
        pos_set = set(pos)
        for i in range(1, len(pos)):
          hist = '|'.join(pos[:i][-50:])
          out.write('%s\t%s\t%s\t1\n' % (u, hist, pos[i]))
          for _ in range(negs):
            neg = str(rng.randint(1, MAX_BOOK))
            while neg in pos_set:
              neg = str(rng.randint(1, MAX_BOOK))
            out.write('%s\t%s\t%s\t0\n' % (u, hist, neg))

  expand(raw_tr, tr)
  expand(raw_te, te)
  return tr, te


def books_config(model: str, tr: str, te: str, model_dir: str,
                 num_steps: int = 20000) -> str:
  if model == 'dssm':
    body = """
  model_class: "DSSM"
  feature_groups {
    group_name: "user"
    feature_names: "user_id"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "item" feature_names: "book_id" wide_deep: DEEP
  }
  seq_att_groups {
    group_name: "seq_fea"
    seq_att_map { key: "book_id" hist_seq: "book_id_seq" }
    allow_key_search: true
  }
  dssm {
    user_tower { id: "user_id" dnn { hidden_units: [256, 128, 64, 32] } }
    item_tower { id: "book_id" dnn { hidden_units: [256, 128, 64, 32] } }
    l2_regularization: 1e-6
  }
  embedding_regularization: 5e-5
  loss_type: CLASSIFICATION
"""
  elif model == 'mind':
    body = """
  model_class: "MIND"
  feature_groups { group_name: "hist" feature_names: "book_id_seq"
                   wide_deep: DEEP }
  feature_groups { group_name: "user" feature_names: "user_id"
                   wide_deep: DEEP }
  feature_groups { group_name: "item" feature_names: "book_id"
                   wide_deep: DEEP }
  mind {
    user_dnn { hidden_units: [128, 64, 32] }
    item_dnn { hidden_units: [128, 64, 32] }
    concat_dnn { hidden_units: [64, 32] }
    capsule_config { max_k: 3 max_seq_len: 50 high_dim: 64 }
    l2_regularization: 1e-6
    item_id: "book_id"
  }
  embedding_regularization: 5e-5
  loss_type: CLASSIFICATION
"""
  else:
    raise KeyError(model)
  return """
train_input_path: "%s"
eval_input_path: "%s"
model_dir: "%s"
train_config {
  log_step_count_steps: 500
  optimizer_config {
    adam_optimizer {
      learning_rate { constant_learning_rate { learning_rate: 0.001 } }
    }
  }
  save_checkpoints_steps: 20000
  num_steps: %d
}
eval_config { metrics_set { auc {} } }
data_config {
  separator: "\\t"
  batch_size: 4096
  num_epochs: 2
  label_fields: "label"
  input_fields { input_name: "user_id" input_type: STRING }
  input_fields { input_name: "book_id_seq" input_type: STRING }
  input_fields { input_name: "book_id" input_type: STRING }
  input_fields { input_name: "label" input_type: FLOAT }
  input_type: CSVInput
}
feature_config {
  features { input_names: "user_id" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 500000 }
  features { input_names: "book_id" feature_type: IdFeature
             embedding_dim: 16 hash_bucket_size: 400000 }
  features { input_names: "book_id_seq" feature_type: SequenceFeature
             separator: "|" embedding_dim: 16 hash_bucket_size: 400000
             max_seq_len: 50 }
}
model_config {
%s
}
""" % (tr, te, model_dir, num_steps, body)


# ------------------------------------------------------------- runner

def run_case(name: str, cfg_text: str, work: str, smoke: bool):
  from easyrec_tpu.config import get_configs_from_pipeline_str
  from easyrec_tpu.train.trainer import Trainer
  cfg = get_configs_from_pipeline_str(cfg_text)
  if smoke:
    cfg.train_config.num_steps = 20
    cfg.eval_config.num_examples = 4096
  trainer = Trainer(cfg)
  result = trainer.fit(checkpoint=not smoke)
  auc = result['eval_metrics'].get('auc')
  anchor = ANCHORS.get(name)
  tol = NORTH_STAR_TOL if name == 'deepfm_on_criteo' else TOL
  if smoke or anchor is None:
    verdict = 'SMOKE' if smoke else 'INFO'
  elif auc >= anchor - tol:
    verdict = 'PASS'
  else:
    verdict = 'FAIL'
  line = {'case': name, 'auc': None if auc is None else round(auc, 5),
          'anchor': anchor, 'tol': tol, 'verdict': verdict,
          'steps': int(result['global_step'])}
  print(json.dumps(line), flush=True)
  return line


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument('--data_dir', default='data/quality')
  ap.add_argument('--work_dir', default='/tmp/easyrec_quality')
  ap.add_argument('--models', default='',
                  help='comma list filter, e.g. deepfm_on_criteo')
  ap.add_argument('--smoke', action='store_true',
                  help='20-step plumbing check (no quality claims)')
  args = ap.parse_args(argv)
  want = set(filter(None, args.models.split(',')))

  cases = []
  crit = prepare_criteo(os.path.join(args.data_dir, 'criteo'),
                        os.path.join(args.work_dir, 'criteo'))
  if crit:
    tr, te, mm = crit
    for m in ('fm', 'deepfm', 'dlrm'):
      name = '%s_on_criteo' % m
      cases.append((name, lambda m=m, name=name, tr=tr, te=te, mm=mm:
                    criteo_config(m, tr, te, mm,
                                  os.path.join(args.work_dir, name))))
  ml = prepare_movielens(os.path.join(args.data_dir, 'ml-1m'),
                         os.path.join(args.work_dir, 'ml-1m'))
  if ml:
    tr, te = ml
    for m in ('mlp', 'wide_and_deep', 'deepfm', 'dcn', 'autoint',
              'masknet', 'fibinet'):
      name = '%s_on_movielens' % m
      cases.append((name, lambda m=m, name=name, tr=tr, te=te:
                    movielens_config(m, tr, te,
                                     os.path.join(args.work_dir, name))))
  books = prepare_books(os.path.join(args.data_dir, 'books'),
                        os.path.join(args.work_dir, 'books'))
  if books:
    tr, te = books
    for m in ('dssm', 'mind'):
      name = '%s_on_books' % m
      cases.append((name, lambda m=m, name=name, tr=tr, te=te:
                    books_config(m, tr, te,
                                 os.path.join(args.work_dir, name))))

  if not cases:
    print(json.dumps({'skipped': True,
                      'reason': 'no datasets under %s (see module '
                                'docstring for expected layout)'
                                % args.data_dir}))
    return 0
  results = []
  for name, make in cases:
    if want and name not in want:
      continue
    results.append(run_case(name, make(), args.work_dir, args.smoke))
  failed = [r for r in results if r['verdict'] == 'FAIL']
  print(json.dumps({'total': len(results), 'failed': len(failed)}))
  return 1 if failed else 0


if __name__ == '__main__':
  sys.exit(main())
