#!/usr/bin/env python
"""Entry point: python beam.py -m <dir> -n N -k K -s <set> -w W [--resume]."""
from ast_tpu.cli.beam import main

if __name__ == "__main__":
    main()
