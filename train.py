#!/usr/bin/env python
"""Entry point: python train.py -m <experiment_dir> -e <epochs>."""
from ast_tpu.cli.train import main

if __name__ == "__main__":
    main()
