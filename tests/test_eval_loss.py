"""NN.eval_loss: teacher-forced dev loss without updates."""

import numpy as np

from ast_tpu.train.trainer import NN
from tests.conftest import make_tiny_experiment


def test_eval_loss(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    nn = NN(exp)
    params_before = [np.asarray(x).copy()
                     for x in __import__("jax").tree.leaves(nn.params)]
    loss = nn.eval_loss("tiny_dev")
    assert np.isfinite(loss) and loss > 0
    # deterministic (no dropout/noise in eval mode) and side-effect free
    assert abs(nn.eval_loss("tiny_dev") - loss) < 1e-6
    for a, b in zip(params_before,
                    __import__("jax").tree.leaves(nn.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
