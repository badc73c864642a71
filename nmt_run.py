#!/usr/bin/env python
"""Legacy entry point: ``python nmt_run.py -m <experiment_dir> -e N``.

The reference's legacy runner (reference: nmt_run.py:963-969) takes the
same ``-m``/``-e`` CLI as train.py; its distinguishing behaviors
(per-bucket batch sizes, curriculum order, SGD lr scaling, weight-noise
schedule, limit_vocab/add_unk, precision/recall logging) are all
config-driven here and handled by the same trainer (see
docs/COVERAGE.md C13), so the legacy command simply forwards.
"""
from ast_tpu.cli.train import main

if __name__ == "__main__":
    main()
