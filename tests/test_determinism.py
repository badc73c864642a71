"""Cross-process determinism of string-seeded runs.

The reference's only reproducibility mechanism is a fixed config seed
(reference: nn.py:54 seeds ``random`` with train_cfg "seed", a *string*
like "seed-ast-20h").  Two fresh processes given the same experiment must
produce identical model init and identical batch-stream order — this is
also the load-bearing premise of multi-host sharding (every host builds
the same stream and takes its stride).  ``hash()``-based seed derivation
silently breaks this under PYTHONHASHSEED randomization; these tests pin
the sha256 derivation by running two subprocesses with *different*
PYTHONHASHSEED values and asserting identical digests.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")

import hashlib
import sys

import numpy as np

repo, tmpdir = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
sys.path.insert(0, repo + "/tests")

from conftest import make_tiny_experiment
from ast_tpu.config import Config
from ast_tpu.data.dataloader import make_dataloader
from ast_tpu.models import seq2seq
from ast_tpu.train.trainer import _seed_to_int

exp = make_tiny_experiment(tmpdir, seed=7)
cfg = Config(exp)
seed = _seed_to_int(cfg.train["seed"])  # "tiny-seed" (a string)

params, _ = seq2seq.init_model(jax.random.PRNGKey(seed), cfg.model)
h = hashlib.sha256()
for leaf in jax.tree_util.tree_leaves(params):
    h.update(np.asarray(leaf).tobytes())

dl = make_dataloader(cfg.train, cfg.model["model_dir"])
for _ in range(2):  # two epochs of shuffled batch order
    for b in dl.get_batch(4, "tiny_train", train=True, labels=True):
        h.update(" ".join(b["utts"]).encode())
        h.update(np.asarray(b["X"]).tobytes())  # frame dropout included

print("DIGEST", h.hexdigest())
"""


def _run_child(tmpdir, hashseed):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = str(hashseed)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, REPO, str(tmpdir)],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    for line in r.stdout.splitlines():
        if line.startswith("DIGEST "):
            return line.split()[1]
    raise AssertionError(f"no digest in output:\n{r.stdout}\n{r.stderr}")


def test_cross_process_param_and_stream_determinism(tmp_path):
    d1 = _run_child(tmp_path / "a", hashseed=1)
    d2 = _run_child(tmp_path / "b", hashseed=424242)
    assert d1 == d2


def test_stable_seed_values_pinned():
    # pin the derivation so a refactor can't silently change every
    # experiment's effective seed
    from ast_tpu.utils.seeding import stable_seed

    assert stable_seed(123) == 123
    assert stable_seed("x", bits=31) == stable_seed("x", bits=31)
    assert stable_seed("x") != stable_seed("y")
    assert 0 <= stable_seed("seed-ast-20h") < 2 ** 31
