"""Real 2-process multi-host validation (jax.distributed over CPU).

Two OS processes form a global 2-device mesh and drive the actual NN
harness through one train epoch + greedy predict on a shared tiny
experiment.  Asserts the SPMD multi-host contract (SURVEY §2.5 new
capability; ast_tpu/parallel/multihost.py design):
- both processes see the same global loss,
- params stay bit-identical across hosts after the epoch (the gradient
  all-reduce is real),
- predict() returns the FULL dev split on every host (replicated eval
  outputs), so multi-host dev BLEU works.
"""

import pytest

pytestmark = pytest.mark.slow

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
proc_id, port, exp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", 2, proc_id)

import hashlib
import numpy as np
sys.path.insert(0, sys.argv[4])

from ast_tpu.train.trainer import NN

nn = NN(exp)
assert nn.mesh is not None, "expected a 2-device global mesh"
assert int(np.prod(list(nn.mesh.shape.values()))) == 2

loss = nn.train_epoch("tiny_train", epoch=1)

h = hashlib.sha256()
for leaf in jax.tree_util.tree_leaves(nn.params):
    h.update(np.asarray(leaf).tobytes())

preds = nn.predict("tiny_dev")
utts = ",".join(sorted(u for u, _ in preds))

beams = nn.decode_beam_set("tiny_dev", N=2, K=2)
assert all(len(hyps) == 2 for hyps in beams.values())
# content digest: every host must materialize IDENTICAL full-split
# beams (hyp ids + scores), not just the same count
bh = hashlib.sha256()
for utt in sorted(beams):
    for ids, score in beams[utt]:
        bh.update(f"{utt}:{ids}:{score:.4f};".encode())

# preemption agreement: SIGTERM lands on host 1 only; the OR-allgather
# must stop BOTH hosts at the same consumed count (a host-local stop
# would deadlock the other in the next dispatch's collectives)
from ast_tpu.train.trainer import PreemptedError
if proc_id == 1:
    nn.request_preempt()
try:
    nn.train_epoch("tiny_train", epoch=2)
    stop = "none"
except PreemptedError as e:
    stop = str(e).split()[-2]

print(f"RESULT {proc_id} {loss:.6f} {h.hexdigest()} {len(preds)} "
      f"{hashlib.sha256(utts.encode()).hexdigest()} {len(beams)} "
      f"{bh.hexdigest()} {stop}",
      flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("hbm_cache", [False, True],
                         ids=["hostfed", "hbm_cache"])
def test_two_process_train_and_predict(tmp_path, hbm_cache):
    from tests.conftest import make_tiny_experiment

    # steps_per_dispatch=2: the tiny stream exercises BOTH the scanned
    # multi-step group path and the partial-run singles fallback across
    # hosts, composing multi-step dispatch with the SPMD multi-host
    # mesh.  The hbm_cache arm additionally validates the replicated
    # device cache + sharded gather indices under REAL multi-process
    # SPMD (each process device_puts the identical cache and gathers
    # its local rows).
    extras = {"steps_per_dispatch": 2, "preempt_sync_steps": 1}
    if hbm_cache:
        extras["hbm_cache"] = True
    exp = make_tiny_experiment(str(tmp_path), n_train=8, n_dev=6,
                               batch_size=4, extras=extras)
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one local CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(i), str(port), exp, REPO],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                (_, pid, loss, digest, n_preds, utt_hash,
                 n_beams, beam_hash, stop) = line.split()
                results[int(pid)] = (loss, digest, int(n_preds), utt_hash,
                                     int(n_beams), beam_hash, stop)
    assert set(results) == {0, 1}, f"missing RESULT lines:\n{outs}"

    r0, r1 = results[0], results[1]
    assert r0[0] == r1[0], "global loss differs between hosts"
    assert r0[1] == r1[1], "params diverged between hosts"
    assert r0[2] == r1[2] == 6, "predict() must return the full dev split"
    assert r0[3] == r1[3], "prediction utt coverage differs"
    assert r0[4] == r1[4] == 6, "beam decode must cover the full split"
    assert r0[5] == r1[5], "beam hypotheses/scores differ between hosts"
    assert r0[6] == r1[6] != "none", (
        "hosts must agree on the preemption stop step "
        f"(got {r0[6]} vs {r1[6]})")
