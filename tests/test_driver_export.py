"""Driver API + export + predictor: train via train_and_evaluate, export,
load with Predictor, check parity between training-eval predictions and
serving predictions (reference export_test.py pattern)."""

import os

import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope='module')
def run(tmp_path_factory):
  tmp = tmp_path_factory.mktemp('driver')
  cfg_path = fixtures.write_pipeline(tmp, num_steps=40)
  from easyrec_tpu import main as driver
  result = driver.train_and_evaluate(cfg_path)
  return str(tmp), cfg_path, result


def test_train_and_evaluate_artifacts(run):
  tmp, cfg_path, result = run
  model_dir = os.path.join(tmp, 'ckpt')
  assert os.path.exists(os.path.join(model_dir, 'pipeline.config'))
  assert os.path.exists(os.path.join(model_dir, 'version'))
  assert os.path.exists(os.path.join(model_dir, 'eval_result.txt'))
  assert 'export_dir' in result
  assert os.path.exists(os.path.join(result['export_dir'],
                                     'export_meta.json'))


def test_evaluate_api(run):
  tmp, cfg_path, result = run
  from easyrec_tpu import main as driver
  metrics = driver.evaluate(cfg_path)
  assert 'auc' in metrics
  assert abs(metrics['auc'] - result['eval_metrics']['auc']) < 0.02


def test_predictor_parity(run):
  tmp, cfg_path, result = run
  from easyrec_tpu.export.predictor import Predictor
  predictor = Predictor(result['export_dir'], batch_size=64)
  # online-style dict inputs
  rows = [
      {'d1': '0.5', 'd2': '0.1', 'c1': 'u3', 'c2': 'v1', 'c3': 'w2'},
      {'d1': '0.9', 'd2': '0.9', 'c1': 'u7', 'c2': 'v2', 'c3': 'w0'},
  ]
  outs = predictor.predict(rows)
  assert len(outs) == 2
  assert 0.0 <= float(outs[0]['probs']) <= 1.0

  # batch CSV predict parity vs driver.predict
  from easyrec_tpu import main as driver
  eval_csv = os.path.join(tmp, 'eval.csv')
  out_csv = os.path.join(tmp, 'preds.csv')
  n = predictor.predict_csv(eval_csv, out_csv)
  assert n == 1024
  driver_rows = driver.predict(cfg_path)
  assert len(driver_rows) == 1024
  import csv
  with open(out_csv) as f:
    reader = csv.DictReader(f)
    serving_probs = np.array([float(r['probs']) for r in reader])
  driver_probs = np.array([float(r['probs']) for r in driver_rows])
  np.testing.assert_allclose(serving_probs, driver_probs, atol=1e-5)


def test_view_export_tool(run):
  tmp, cfg_path, result = run
  from easyrec_tpu.tools import view_export
  summary = view_export.describe_export(result['export_dir'])
  assert summary['meta']['model_class'] == 'DeepFM'
  assert summary['meta']['outputs']
  if 'variables' in summary:
    assert summary['num_parameters'] > 0
  smoke = view_export.smoke_predict(result['export_dir'])
  assert 0.0 <= float(smoke['probs']) <= 1.0


def test_predict_and_chk_tool(run, tmp_path):
  tmp, cfg_path, result = run
  from easyrec_tpu.tools import predict_and_chk
  out = str(tmp_path / 'pred.csv')
  eval_csv = os.path.join(tmp, 'eval.csv')
  r = predict_and_chk.predict_and_check(result['export_dir'], eval_csv,
                                        out)
  assert r['num_predictions'] > 0
  # self-comparison matches exactly
  r2 = predict_and_chk.predict_and_check(
      result['export_dir'], eval_csv, str(tmp_path / 'pred2.csv'),
      cmp_path=out, cmp_key='probs', tol=1e-6)
  assert r2['matched'], r2
  # perturbed expectation fails the check
  import csv as csv_lib
  with open(out) as f:
    rows = list(csv_lib.DictReader(f))
  rows[0]['probs'] = str(float(rows[0]['probs']) + 0.5)
  bad = str(tmp_path / 'bad.csv')
  with open(bad, 'w', newline='') as f:
    w = csv_lib.DictWriter(f, fieldnames=rows[0].keys())
    w.writeheader()
    w.writerows(rows)
  r3 = predict_and_chk.predict_and_check(
      result['export_dir'], eval_csv, str(tmp_path / 'pred3.csv'),
      cmp_path=bad, cmp_key='probs', tol=1e-4)
  assert not r3['matched']


def test_cli_eval(run, capsys):
  tmp, cfg_path, result = run
  from easyrec_tpu import eval as eval_cli
  assert eval_cli.main(['--pipeline_config_path', cfg_path]) == 0
