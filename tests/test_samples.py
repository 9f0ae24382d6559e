"""Every sample config parses, passes pre-check, and trains ONE REAL step
through the full CSV pipeline (reader -> transforms -> sampler splice ->
jitted train step) on generated fixture data matching the shared sample
schemas. Mirrors the reference's train_eval_test config matrix
(easy_rec/python/test/train_eval_test.py:56+) at 1-step scale."""

import glob
import os

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file

SAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), '..', 'samples', '*.config')))

# Columns of the shared sample schemas (samples/*.config header comments).
STANDARD_COLS = ['label', 'uid', 'iid', 'cate', 'tags', 'age', 'price',
                 'seq_cate', 'buy', 'kvtags', 'lkp_map']
MM_COLS = ['label', 'uid', 'iid', 'cate', 'title', 'img_vec', 'age']

N_ITEMS = 40


def _row_value(col, rng, i):
  if col == 'label':
    return str(int(rng.integers(0, 2)))
  if col == 'buy':
    return str(int(rng.integers(0, 2)))
  if col == 'uid':
    return 'u%d' % rng.integers(0, 30)
  if col == 'iid':
    return 'i%d' % rng.integers(0, N_ITEMS)
  if col == 'cate':
    return 'c%d' % rng.integers(0, 8)
  if col == 'tags':
    k = rng.integers(1, 4)
    return '|'.join('t%d' % rng.integers(0, 50) for _ in range(k))
  if col in ('age', 'price', 'teacher'):
    return '%.3f' % rng.random()
  if col == 'seq_cate':
    k = rng.integers(1, 6)
    return '|'.join('c%d' % rng.integers(0, 8) for _ in range(k))
  if col == 'seq_price':
    k = rng.integers(1, 6)
    return '|'.join('%.2f' % (rng.random() * 100) for _ in range(k))
  if col == 'title':
    k = rng.integers(1, 5)
    return '|'.join('w%d' % rng.integers(0, 100) for _ in range(k))
  if col == 'img_vec':
    return '|'.join('%.3f' % rng.random() for _ in range(64))
  if col == 'kvtags':
    k = rng.integers(1, 4)
    return '|'.join('t%d:%.2f' % (rng.integers(0, 50), rng.random())
                    for _ in range(k))
  if col == 'lkp_map':
    return '|'.join('c%d:%.2f' % (c, rng.random())
                    for c in rng.choice(8, 3, replace=False))
  raise KeyError(col)


def _typed_value(field, rng):
  """Generic value for fg.json-generated columns: by declared input
  type, with '<seq>__<sub>' names getting |-joined position lists."""
  from easyrec_tpu.protos import data_pb2
  ft = data_pb2.DatasetConfig.FieldType
  if field.input_type in (ft.FLOAT, ft.DOUBLE, ft.INT32, ft.INT64):
    return '%.3f' % rng.random()
  if '__' in field.input_name:
    k = rng.integers(1, 6)
    return '|'.join('v%d' % rng.integers(0, 50) for _ in range(k))
  return 'v%d' % rng.integers(0, 50)


def _write_csv(path, cols, n, seed):
  rng = np.random.default_rng(seed)
  with open(path, 'w') as f:
    for i in range(n):
      f.write(','.join(_row_value(c, rng, i) for c in cols) + '\n')


def _write_items(path):
  """GraphLearn-style item table for the negative sampler: attrs cover the
  dssm_neg_sampler attr_fields (iid, cate, price)."""
  rng = np.random.default_rng(7)
  with open(path, 'w') as f:
    f.write('id:int64\tweight:float\tfeature:string\n')
    for i in range(N_ITEMS):
      f.write('i%d\t%.4f\ti%d:c%d:%.3f\n'
              % (i, rng.random() + 0.1, i, i % 8, rng.random()))


def _write_edges(path):
  """Hard-negative edge table (user -> item)."""
  rng = np.random.default_rng(8)
  with open(path, 'w') as f:
    for u in range(30):
      for i in rng.choice(N_ITEMS, 3, replace=False):
        f.write('u%d\ti%d\t1.0\n' % (u, i))


@pytest.fixture(scope='module')
def sample_data(tmp_path_factory):
  d = tmp_path_factory.mktemp('sample_data')
  paths = {
      'data/train.csv': str(d / 'train.csv'),
      'data/eval.csv': str(d / 'eval.csv'),
      'data/train_mm.csv': str(d / 'train_mm.csv'),
      'data/eval_mm.csv': str(d / 'eval_mm.csv'),
      'data/items.txt': str(d / 'items.txt'),
      'data/edges.txt': str(d / 'edges.txt'),
  }
  _write_csv(paths['data/train.csv'], STANDARD_COLS, 256, seed=1)
  _write_csv(paths['data/eval.csv'], STANDARD_COLS, 64, seed=2)
  _write_csv(paths['data/train_mm.csv'], MM_COLS, 256, seed=3)
  _write_csv(paths['data/eval_mm.csv'], MM_COLS, 64, seed=4)
  _write_items(paths['data/items.txt'])
  _write_edges(paths['data/edges.txt'])
  return paths


def _column_subset(cfg, paths, tmp):
  """Sample configs may declare a subset of the shared schema columns;
  regenerate the CSVs with exactly the declared input_fields. fg-driven
  configs (generated input_fields) fall back to typed generic values."""
  fields = list(cfg.data_config.input_fields)
  cols = [f.input_name for f in fields]
  known = set(STANDARD_COLS) | set(MM_COLS) | {'teacher', 'seq_price'}
  train = os.path.join(tmp, 'train.csv')
  evalp = os.path.join(tmp, 'eval.csv')
  if all(c in known for c in cols):
    _write_csv(train, cols, 256, seed=11)
    _write_csv(evalp, cols, 64, seed=12)
  else:
    for path, n, seed in ((train, 256, 11), (evalp, 64, 12)):
      rng = np.random.default_rng(seed)
      with open(path, 'w') as f:
        for i in range(n):
          f.write(','.join(
              _row_value(c, rng, i) if c in known else
              _typed_value(fld, rng)
              for c, fld in zip(cols, fields)) + '\n')
  return train, evalp


def _convert_format(cfg, train, evalp, tmp):
  """Input-type-bearing samples (TFRecord/Parquet/gzip CSV) get their
  fixture data converted from the generated CSV into the declared wire
  format, exercising the real readers end to end."""
  from easyrec_tpu.protos import data_pb2
  dc = cfg.data_config
  itype = data_pb2.DatasetConfig.InputType.Name(dc.input_type)
  fields = list(dc.input_fields)
  ft = data_pb2.DatasetConfig.FieldType

  def rows(path):
    with open(path) as f:
      for line in f:
        vals = line.rstrip('\n').split(dc.separator or ',')
        row = {}
        for fld, v in zip(fields, vals):
          if fld.input_type in (ft.FLOAT, ft.DOUBLE):
            row[fld.input_name] = float(v)
          elif fld.input_type in (ft.INT32, ft.INT64):
            row[fld.input_name] = int(float(v))
          else:
            row[fld.input_name] = v
        yield row

  if itype in ('TFRecordInput', 'BatchTFRecordInput'):
    from easyrec_tpu.data import tfrecord
    out = []
    for path, tag in ((train, 'train'), (evalp, 'eval')):
      dst = os.path.join(tmp, '%s.tfrecord' % tag)
      tfrecord.write_records(
          dst, (tfrecord.columns_to_example(r) for r in rows(path)))
      out.append(dst)
    return out[0], out[1]
  if itype.startswith('Parquet') or itype == 'HiveParquetInput':
    import pyarrow as pa
    import pyarrow.parquet as pq
    out = []
    for path, tag in ((train, 'train'), (evalp, 'eval')):
      data = list(rows(path))
      cols = {f.input_name: [r[f.input_name] for r in data]
              for f in fields}
      dst = os.path.join(tmp, '%s.parquet' % tag)
      pq.write_table(pa.table(cols), dst)
      out.append(dst)
    return out[0], out[1]
  if itype == 'CSVInput' and cfg.train_input_path.endswith('.gz'):
    import gzip
    import shutil
    out = []
    for path, tag in ((train, 'train'), (evalp, 'eval')):
      dst = os.path.join(tmp, '%s.csv.gz' % tag)
      with open(path, 'rb') as src, gzip.open(dst, 'wb') as g:
        shutil.copyfileobj(src, g)
      out.append(dst)
    return out[0], out[1]
  return train, evalp


@pytest.mark.parametrize('path', SAMPLES,
                         ids=[os.path.basename(p) for p in SAMPLES])
def test_sample_trains(path, sample_data, tmp_path):
  from easyrec_tpu.tools.pre_check import check_config
  from easyrec_tpu.train.trainer import Trainer

  cfg = get_configs_from_pipeline_file(path)
  repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  if cfg.fg_json_path:
    # mirror the driver (main.py): fg.json generates data/feature configs
    from easyrec_tpu.utils.fg_util import load_fg_json_to_config
    if not os.path.isabs(cfg.fg_json_path):
      cfg.fg_json_path = os.path.join(repo_root, cfg.fg_json_path)
    load_fg_json_to_config(cfg)
  problems = check_config(cfg)
  assert problems == [], problems

  train, evalp = _column_subset(cfg, sample_data, str(tmp_path))
  train, evalp = _convert_format(cfg, train, evalp, str(tmp_path))
  cfg.train_input_path = train
  cfg.eval_input_path = evalp
  cfg.model_dir = ''                       # no checkpointing
  cfg.train_config.num_steps = 1
  cfg.data_config.batch_size = 32
  which = cfg.data_config.WhichOneof('sampler')
  if which:
    sampler_cfg = getattr(cfg.data_config, which)
    for f in ('input_path', 'user_input_path', 'item_input_path'):
      if hasattr(sampler_cfg, f) and getattr(sampler_cfg, f):
        setattr(sampler_cfg, f, sample_data['data/items.txt'])
    for f in ('hard_neg_edge_input_path', 'pos_edge_input_path'):
      if getattr(sampler_cfg, f, ''):
        setattr(sampler_cfg, f, sample_data['data/edges.txt'])
    # keep the sampled-negative count small for a 1-step smoke
    sampler_cfg.num_sample = min(sampler_cfg.num_sample, 16)

  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  for fc in cfg.feature_config.features:
    if fc.vocab_file and not os.path.isabs(fc.vocab_file):
      fc.vocab_file = os.path.join(repo, fc.vocab_file)
  trainer = Trainer(cfg)
  pipe = trainer.train_input()
  batch = next(iter(pipe))
  if which:
    assert any(k.startswith('neg.') for k in batch), sorted(batch)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  state, loss = trainer.train_step(state, sharded)
  assert np.isfinite(float(loss['total_loss']))
