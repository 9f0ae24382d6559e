"""Model-server CLI: `python -m easyrec_tpu.serve --export_dir ...`
(the reference's serving side is the external EAS EasyRec Processor;
see serving/server.py)."""

from easyrec_tpu.serving.server import main

if __name__ == '__main__':
  main()
