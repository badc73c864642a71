#!/usr/bin/env python
"""Entry point: python copy_params.py --src <dir> --dst <dir> --groups enc."""
from ast_tpu.cli.copy_params import main

if __name__ == "__main__":
    main()
