"""Reference-semantics parity: ast_tpu forward vs the NumPy oracle.

The oracle (tests/reference_oracle.py) replicates the reference's forward
pass (reference: seq2seq.py:399-473 loss, :475-527 predict) with
per-timestep loops at fixed weights.  These tests pin:
- eval-mode teacher-forced loss agreement <= 1e-5 (both reversal modes),
- train-mode scheduled-sampling input chain (teach_ratio=0: every
  non-forced step consumes the previous argmax — deterministic, no RNG),
- greedy decode token agreement,
- that the ``ref_rev_quirk`` flag actually changes the computation.

This is the closest achievable proxy to reference-BLEU parity without the
Chainer/CUDA stack: the architecture quirks that affect BLEU (unmasked
attention, forced first/last steps, X[-i] reversal, class-weighted
normalize-by-batch loss) are each load-bearing here.
"""

import copy

import numpy as np
import pytest

import jax

from ast_tpu.models import seq2seq
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG
from tests.reference_oracle import ReferenceOracle


def _perturb(tree, rng, scale=0.2):
    """Add noise to every leaf so zero-init biases/BN stats are exercised."""
    return jax.tree.map(
        lambda a: np.asarray(a) + scale * rng.randn(*np.shape(a)), tree)


def _setup(rev_quirk=False, seed=3):
    mcfg = copy.deepcopy(TINY_MODEL_CFG)
    mcfg["rnn_config"]["dec_vocab_size"] = 32
    mcfg["dropout"] = {"embed": 0, "rnn": 0, "out": 0}
    if rev_quirk:
        mcfg["rnn_config"]["ref_rev_quirk"] = True
    params, state = seq2seq.init_model(jax.random.PRNGKey(seed), mcfg)
    rng = np.random.RandomState(seed)
    params = _perturb(params, rng)
    state = _perturb(state, rng, 0.1)
    # variances must stay positive
    state["cnn_bn"] = [
        {"bn_mean": s["bn_mean"],
         "bn_var": np.abs(s["bn_var"]) + 0.5}
        for s in state["cnn_bn"]]
    import jax.numpy as jnp
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    state = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), state)

    B, T, U = 3, 24, 9
    X = rng.randn(B, T, 13).astype(np.float32)
    y = np.zeros((B, U), np.int32)
    for b, n_words in enumerate([6, 4, 7]):
        y[b, 0] = SYMBOLS.GO_ID
        y[b, 1:1 + n_words] = rng.randint(4, 32, n_words)
        y[b, 1 + n_words] = SYMBOLS.EOS_ID
    return mcfg, params, state, X, y


@pytest.mark.parametrize("rev_quirk", [False, True])
def test_eval_loss_matches_oracle(rev_quirk):
    mcfg, params, state, X, y = _setup(rev_quirk)
    got, _ = seq2seq.forward_loss(
        params, state, mcfg, X, y, jax.random.PRNGKey(0), train=False,
        teach_ratio=1.0)
    oracle = ReferenceOracle(params, state, mcfg)
    want = oracle.forward_loss(X, y, teach_ratio=1.0, train=False,
                               rev_quirk=rev_quirk)
    assert abs(float(got) - want) / abs(want) <= 1e-5


def test_train_scheduled_sampling_chain_matches_oracle():
    """teach_ratio=0: every non-forced step feeds the previous argmax.
    With dropout/noise at 0 this path is deterministic, so the full
    scheduled-sampling semantics (coin placement, forced first/last
    steps, argmax chaining) are compared exactly — in train mode, i.e.
    batch-stat BatchNorm."""
    mcfg, params, state, X, y = _setup()
    got, _ = seq2seq.forward_loss(
        params, state, mcfg, X, y, jax.random.PRNGKey(7), train=True,
        teach_ratio=0.0, random_out=0.0, add_noise=0.0)
    oracle = ReferenceOracle(params, state, mcfg)
    want = oracle.forward_loss(X, y, teach_ratio=0.0, train=True)
    assert abs(float(got) - want) / abs(want) <= 1e-5


def test_greedy_decode_matches_oracle():
    mcfg, params, state, X, y = _setup()
    stop = 12
    preds, _ = seq2seq.predict_greedy(params, state, mcfg, X, stop)
    preds = np.asarray(preds)
    oracle = ReferenceOracle(params, state, mcfg)
    want = oracle.predict(X, SYMBOLS.GO_ID, SYMBOLS.EOS_ID, stop)
    for b in range(X.shape[0]):
        w = list(want[b])
        g = list(preds[b][: len(w)])
        # compare up to and including the first EOS
        if SYMBOLS.EOS_ID in w:
            n = w.index(SYMBOLS.EOS_ID) + 1
            w, g = w[:n], g[:n]
        assert g == w, f"row {b}: {g} != {w}"


def _setup_variant(edit_mcfg, seed=5, text_mode=False):
    """Build a variant model (linear_proj / n_attn>1 / text-encoder)
    with perturbed weights + matching inputs."""
    mcfg = copy.deepcopy(TINY_MODEL_CFG)
    mcfg["rnn_config"]["dec_vocab_size"] = 32
    mcfg["dropout"] = {"embed": 0, "rnn": 0, "out": 0}
    edit_mcfg(mcfg)
    params, state = seq2seq.init_model(jax.random.PRNGKey(seed), mcfg)
    rng = np.random.RandomState(seed)
    params = _perturb(params, rng)
    state = _perturb(state, rng, 0.1)
    state["cnn_bn"] = [
        {"bn_mean": s["bn_mean"], "bn_var": np.abs(s["bn_var"]) + 0.5}
        for s in state["cnn_bn"]]
    state["enc_proj_bn"] = [
        {"bn_mean": s["bn_mean"], "bn_var": np.abs(s["bn_var"]) + 0.5}
        for s in state["enc_proj_bn"]]
    import jax.numpy as jnp
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    state = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), state)

    B, T, U = 3, 24, 9
    if text_mode:
        X = np.zeros((B, T), np.int32)
        for b in range(B):
            X[b, : 8 + b] = rng.randint(4, 32, 8 + b)
    else:
        X = rng.randn(B, T, 13).astype(np.float32)
    y = np.zeros((B, U), np.int32)
    for b, n_words in enumerate([6, 4, 7]):
        y[b, 0] = SYMBOLS.GO_ID
        y[b, 1:1 + n_words] = rng.randint(4, 32, n_words)
        y[b, 1 + n_words] = SYMBOLS.EOS_ID
    return mcfg, params, state, X, y


def _oracle_agree(mcfg, params, state, X, y, train=False):
    got, _ = seq2seq.forward_loss(
        params, state, mcfg, X, y, jax.random.PRNGKey(0), train=train,
        teach_ratio=1.0)
    oracle = ReferenceOracle(params, state, mcfg)
    want = oracle.forward_loss(X, y, teach_ratio=1.0, train=train)
    assert abs(float(got) - want) / abs(want) <= 1e-5, (
        f"{float(got)} vs oracle {want}")


@pytest.mark.parametrize("train", [False, True])
def test_linear_proj_matches_oracle(train):
    """The linear_proj encoder variant (per-layer biLSTM + Linear+BN+
    ReLU between layers, reference: seq2seq.py:244-291 with the
    documented reversal correction) agrees with the oracle in both BN
    modes."""
    def edit(m):
        m["rnn_config"]["linear_proj"] = True
    mcfg, params, state, X, y = _setup_variant(edit)
    _oracle_agree(mcfg, params, state, X, y, train=train)


def test_multi_attention_matches_oracle():
    """n_attn=2: duplicated attention heads with separate Wa and
    concatenated context vectors (reference: seq2seq.py:107-122,
    381-383)."""
    def edit(m):
        m["rnn_config"]["n_attn"] = 2
    mcfg, params, state, X, y = _setup_variant(edit)
    _oracle_agree(mcfg, params, state, X, y)


def test_rnn_relu_matches_oracle():
    """rnn_relu: ReLU on every encoder AND decoder LSTM layer output
    (reference: enc_dec.py:282-283; feed_rnn serves both stacks,
    enc_dec.py:288, 304).  Decoder-init states stay pre-ReLU (raw LSTM
    h/c, enc_dec.py:216-221)."""
    def edit(m):
        m["rnn_config"]["rnn_relu"] = True
    mcfg, params, state, X, y = _setup_variant(edit)
    _oracle_agree(mcfg, params, state, X, y)
    # the knob must actually change the computation
    m2 = copy.deepcopy(mcfg)
    m2["rnn_config"]["rnn_relu"] = False
    l_on, _ = seq2seq.forward_loss(
        params, state, mcfg, X, y, jax.random.PRNGKey(0), train=False)
    l_off, _ = seq2seq.forward_loss(
        params, state, m2, X, y, jax.random.PRNGKey(0), train=False)
    assert abs(float(l_on) - float(l_off)) > 1e-6


def test_text_encoder_mode_matches_oracle():
    """Text-encoder mode: source-token embedding feeding the same
    CNN+RNN stack (reference: enc_dec.py:162-164, 517-525)."""
    def edit(m):
        m["rnn_config"]["enc_vocab_size"] = 32
        m["rnn_config"]["embedding_units"] = 8
        m["cnn_config"]["cnn_layers"] = [
            {"in_channels": None, "out_channels": 8, "ksize": [3, 8],
             "stride": [1, 8], "pad": [1, 0]},
            {"in_channels": None, "out_channels": 16, "ksize": [3, 1],
             "stride": [2, 1], "pad": [1, 0]},
        ]
    mcfg, params, state, X, y = _setup_variant(edit, text_mode=True)
    _oracle_agree(mcfg, params, state, X, y)


def test_rev_quirk_flag_changes_computation():
    mcfg, params, state, X, y = _setup(rev_quirk=False)
    mcfg_q = copy.deepcopy(mcfg)
    mcfg_q["rnn_config"]["ref_rev_quirk"] = True
    l0, _ = seq2seq.forward_loss(
        params, state, mcfg, X, y, jax.random.PRNGKey(0), train=False)
    l1, _ = seq2seq.forward_loss(
        params, state, mcfg_q, X, y, jax.random.PRNGKey(0), train=False)
    assert abs(float(l0) - float(l1)) > 1e-6
