"""Convert Criteo terabyte TSV logs into the packed binary format.

The analog of the reference's tools/criteo/convert_data.py: the
CriteoInput reader (data/input_pipeline.py CriteoBinaryReader, layout
from reference input/criteo_binary_reader.py) consumes fixed 40-int32
records — label, 13 integer dense features, 26 categorical ids. This
tool packs the raw `day_*` TSV files (label \t 13 ints \t 26 hex
strings) into that format, one output shard per input file.

Missing dense values become 0; categorical hex ids keep their low 32
bits (the reader re-hashes into each feature's bucket space anyway).

CLI:
  python -m easyrec_tpu.tools.criteo_convert \
      --input_path 'data/day_*.tsv' --output_dir data/bin [--gzip]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import sys

import numpy as np

N_DENSE = 13
N_CAT = 26
RECORD_INTS = 1 + N_DENSE + N_CAT


def convert_file(in_path: str, out_path: str, chunk_rows: int = 1 << 18,
                 is_gzip: bool = False) -> int:
  """Pack one TSV file; returns the record count."""
  opener = gzip.open if (is_gzip or in_path.endswith('.gz')) else open
  n_total = 0
  with opener(in_path, 'rt') as f, open(out_path, 'wb') as out:
    rows = []
    for line in f:
      parts = line.rstrip('\n').split('\t')
      if len(parts) < RECORD_INTS:
        parts = parts + [''] * (RECORD_INTS - len(parts))
      rec = np.zeros(RECORD_INTS, dtype=np.int64)
      rec[0] = int(parts[0] or 0)
      for i in range(N_DENSE):
        v = parts[1 + i]
        rec[1 + i] = int(v) if v else 0
      for i in range(N_CAT):
        v = parts[1 + N_DENSE + i]
        rec[1 + N_DENSE + i] = int(v, 16) & 0xFFFFFFFF if v else 0
      rows.append(rec)
      if len(rows) >= chunk_rows:
        np.stack(rows).astype(np.int32).tofile(out)
        n_total += len(rows)
        rows = []
    if rows:
      np.stack(rows).astype(np.int32).tofile(out)
      n_total += len(rows)
  return n_total


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--input_path', required=True,
                      help='TSV file or glob (day_0, day_1.gz, ...)')
  parser.add_argument('--output_dir', required=True)
  parser.add_argument('--gzip', action='store_true',
                      help='inputs are gzip-compressed')
  args = parser.parse_args(argv)

  paths = sorted(glob.glob(args.input_path)) or [args.input_path]
  os.makedirs(args.output_dir, exist_ok=True)
  total = 0
  for p in paths:
    base = os.path.basename(p)
    for suf in ('.gz', '.tsv', '.txt'):
      if base.endswith(suf):
        base = base[:-len(suf)]
    out = os.path.join(args.output_dir, base + '.bin')
    n = convert_file(p, out, is_gzip=args.gzip)
    total += n
    print('%s -> %s (%d records)' % (p, out, n), file=sys.stderr)
  print('converted %d records from %d files' % (total, len(paths)),
        file=sys.stderr)


if __name__ == '__main__':
  main()
