"""The checked-in `experiments/syn_tiny` recipe runs from a fresh clone.

The reference's shipped experiments point at LDC corpora that are not in
the tree (reference: experiments/es_en_20h/train_cfg.json ->
./data/fisher/...), so nothing in the reference repo is runnable as
cloned.  `experiments/syn_tiny` + `data/syn_tiny` (generated once by
scripts/make_tiny_experiment.py and committed) close that gap; this test
drives the committed artifacts through the real train and beam CLIs.

The experiment dir is copied to tmp so checkpoints/logs/bucket dicts do
not dirty the repo; the *data* read is the committed pickles/refs.
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import shutil

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(REPO, "experiments", "syn_tiny")


def _stage(tmp_path):
    """Copy the committed experiment dir; absolutize its ./data paths."""
    exp = str(tmp_path / "syn_tiny")
    shutil.copytree(EXP, exp)
    cfg_file = os.path.join(exp, "train_cfg.json")
    with open(cfg_file) as f:
        cfg = json.load(f)
    for k in ("speech_path", "map_path", "vocab_path", "info_path",
              "refs_path"):
        cfg["data"][k] = os.path.join(REPO, cfg["data"][k])
    with open(cfg_file, "w") as f:
        json.dump(cfg, f)
    return exp


def test_committed_recipe_trains_and_beams(tmp_path):
    exp = _stage(tmp_path)

    from ast_tpu.cli import beam as beam_cli
    from ast_tpu.cli import train as train_cli

    train_cli.main(["-m", exp, "-e", "2"])

    with open(os.path.join(exp, "train.log")) as f:
        train_rows = [line.strip().split(", ") for line in f]
    with open(os.path.join(exp, "dev.log")) as f:
        dev_rows = [line.strip().split(", ") for line in f]
    assert [int(r[0]) for r in train_rows] == [1, 2]
    assert all(np.isfinite(float(r[1])) for r in train_rows)
    # loss decreases across the two epochs on the learnable corpus
    assert float(train_rows[1][1]) < float(train_rows[0][1])
    assert [int(r[0]) for r in dev_rows] == [1, 2]
    assert all(0.0 <= float(r[1]) <= 100.0 for r in dev_rows)

    beam_cli.main(["-m", exp, "-s", "syn_tiny_dev",
                   "-n", "2", "-k", "2", "-w", "0.6"])
    out = os.path.join(exp, "syn_tiny_dev_beam_N-2_K-2_W-0.60.en")
    with open(out) as f:
        hyp_lines = f.read().splitlines()
    with open(os.path.join(REPO, "data", "syn_tiny", "refs",
                           "syn_tiny_dev", "eval.ids")) as f:
        n_dev = len(f.read().split())
    assert len(hyp_lines) == n_dev
