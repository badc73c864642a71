#!/bin/sh
# Experiment wrapper (reference equivalent: run_exp.bat): ./run_exp.sh <experiment_dir> <epochs>
python train.py -m "$1" -e "$2"
