"""Serving-artifact export (ast_tpu/serving.py + cli/export_model.py).

Pins the portability contract: an exported artifact deserializes from
bytes alone and reproduces the in-process decoder's outputs exactly,
and the CLI writes runnable artifacts + a framework-free manifest from
an experiment directory.
"""

import copy
import json
import os

import numpy as np

import jax

from conftest import TINY_MODEL_CFG, make_tiny_experiment

from ast_tpu import serving
from ast_tpu.models import seq2seq


def _mcfg(vocab=12):
    m = copy.deepcopy(TINY_MODEL_CFG)
    m["rnn_config"]["dec_vocab_size"] = vocab
    return m


def test_greedy_export_roundtrip(tmp_path):
    mcfg = _mcfg()
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    B, T, stop = 4, 40, 8
    X = np.random.RandomState(0).randn(B, T, 13).astype(np.float32)

    exp = serving.export_greedy(params, state, mcfg, B, T, stop,
                                platforms=("cpu",))
    path = str(tmp_path / "greedy.jaxexp")
    assert serving.save_artifact(exp, path) > 0

    loaded = serving.load_artifact(path)
    preds, n_steps = loaded.call(X)
    ref_preds, ref_steps = seq2seq.predict_greedy(
        params, state, serving._portable_mcfg(mcfg), X, stop)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.asarray(ref_preds))
    assert int(n_steps) == int(ref_steps)

    # repeat calls must hit the jit cache, not re-trace the whole
    # weights-baked-in module (~127 ms/call of host work on the
    # flagship — it capped every artifact variant at ~1k utts/sec
    # before LoadedArtifact; BASELINE.md round 3)
    preds2, _ = loaded.call(X)
    np.testing.assert_array_equal(np.asarray(preds2), np.asarray(preds))
    assert isinstance(loaded, serving.LoadedArtifact)
    assert loaded.call._cache_size() == 1


def test_beam_export_roundtrip(tmp_path):
    from ast_tpu.ops.beam import make_beam_decoder

    mcfg = _mcfg()
    params, state = seq2seq.init_model(jax.random.PRNGKey(1), mcfg)
    B, T, N, K, stop = 2, 40, 2, 2, 6
    X = np.random.RandomState(1).randn(B, T, 13).astype(np.float32)

    exp = serving.export_beam(params, state, mcfg, B, T, N, K, stop,
                              platforms=("cpu",))
    path = str(tmp_path / "beam.jaxexp")
    serving.save_artifact(exp, path)

    hyps, scores, lengths = serving.load_artifact(path).call(X)
    decode = make_beam_decoder(serving._portable_mcfg(mcfg), N, K, stop)
    ref_hyps, ref_scores, ref_lengths = decode(params, state, X)
    np.testing.assert_array_equal(np.asarray(hyps), np.asarray(ref_hyps))
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(ref_scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(lengths),
                                  np.asarray(ref_lengths))


def test_export_cli_default_frames_ladder(tmp_path):
    """No --frames: a quarter-point ladder + the trainer's truncation
    cap, so serving padding stays near training conditions (tiny exp:
    4 buckets x 50 -> [50, 100, 150, 250])."""
    from ast_tpu.cli import export_model

    exp_dir = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp_dir, "--batch", "1", "--platforms", "cpu",
         "--dtype", "float32"])
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert [e["frames"] for e in manifest["entries"]] == [50, 100, 150, 250]


def test_export_cli_writes_runnable_artifacts(tmp_path):
    from ast_tpu.cli import export_model

    exp_dir = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp_dir, "--batch", "2", "--frames", "40",
         "--beam", "2,2", "--platforms", "cpu", "--dtype", "float32"])

    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    kinds = sorted(e["kind"] for e in manifest["entries"])
    assert kinds == ["beam", "greedy"]
    assert manifest["symbols"]["EOS"] == 2

    # the id->token table lets a server detokenize without pickles
    with open(os.path.join(out, manifest["vocab"])) as f:
        vocab = json.load(f)
    assert vocab["1"] == "_GO"
    assert len(vocab) == manifest["dec_vocab_size"]

    greedy = next(e for e in manifest["entries"] if e["kind"] == "greedy")
    loaded = serving.load_artifact(os.path.join(out, greedy["file"]))
    X = np.random.RandomState(2).randn(2, 40, 13).astype(np.float32)
    preds, _ = loaded.call(X)
    assert np.asarray(preds).shape == (2, manifest["stop_limit"])


def test_quantize_params_error_bound_and_roundtrip(tmp_path):
    """int8 weight-only quantization: per-channel dequant error is
    bounded by scale/2, and the quantized artifact reproduces the
    in-process decode over dequantized params exactly."""
    from ast_tpu.serving import _is_q8, dequantize_params, quantize_params

    mcfg = _mcfg()
    params, state = seq2seq.init_model(jax.random.PRNGKey(2), mcfg)
    q = quantize_params(params, min_size=64)

    n_q = sum(_is_q8(x) for x in jax.tree.leaves(
        q, is_leaf=lambda x: _is_q8(x) or not isinstance(x, (dict, list))))
    assert n_q >= 4, "expected the big weight leaves to quantize"

    deq = dequantize_params(q)
    for w, d in zip(jax.tree.leaves(params), jax.tree.leaves(deq)):
        w, d = np.asarray(w, np.float32), np.asarray(d, np.float32)
        if w.ndim >= 2:
            # per-output-channel: OIHW conv -> axis 0, matmul -> last
            out_axis = 0 if w.ndim == 4 else w.ndim - 1
            red = tuple(i for i in range(w.ndim) if i != out_axis)
            amax = np.max(np.abs(w), axis=red, keepdims=True)
        else:
            amax = 0
        bound = np.broadcast_to(np.maximum(amax / 254.0 * 1.001, 1e-8),
                                w.shape)
        assert np.all(np.abs(w - d) <= bound) or w.shape == d.shape and \
            np.array_equal(w, d)

    B, T, stop = 2, 40, 8
    X = np.random.RandomState(3).randn(B, T, 13).astype(np.float32)
    exp = serving.export_greedy(params, state, mcfg, B, T, stop,
                                platforms=("cpu",), quantize=True,
                                q_min_size=64)
    path = str(tmp_path / "greedy_q8.jaxexp")
    qbytes = serving.save_artifact(exp, path)
    preds, _ = serving.load_artifact(path).call(X)
    ref_preds, _ = seq2seq.predict_greedy(
        deq, state, serving._portable_mcfg(mcfg), X, stop)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(ref_preds))

    # the int8 constants make the artifact materially smaller.  Assert
    # on the absolute byte saving vs the number of quantized weight
    # elements (f32 -> int8 saves 3 B/elem minus per-channel scales),
    # not a whole-artifact ratio: on a tiny model the fixed StableHLO
    # module overhead dominates and makes any ratio threshold brittle.
    n_q_elems = sum(
        np.asarray(x[serving._Q8_KEY]).size for x in jax.tree.leaves(
            q, is_leaf=_is_q8) if _is_q8(x))
    fexp = serving.export_greedy(params, state, mcfg, B, T, stop,
                                 platforms=("cpu",))
    fbytes = serving.save_artifact(fexp, str(tmp_path / "greedy_f32.jaxexp"))
    assert fbytes - qbytes >= 2.5 * n_q_elems, (qbytes, fbytes, n_q_elems)


def test_export_cli_quantize(tmp_path):
    from ast_tpu.cli import export_model

    exp_dir = make_tiny_experiment(str(tmp_path))
    out = export_model.main(
        ["-m", exp_dir, "--batch", "1", "--frames", "40",
         "--platforms", "cpu", "--dtype", "float32",
         "--quantize", "int8", "--quantize-min-size", "64"])
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert "int8" in manifest["quantization"]
    entry = manifest["entries"][0]
    assert entry["file"].endswith("_q8.jaxexp")
    loaded = serving.load_artifact(os.path.join(out, entry["file"]))
    X = np.random.RandomState(4).randn(1, 40, 13).astype(np.float32)
    preds, _ = loaded.call(X)
    assert np.asarray(preds).shape == (1, manifest["stop_limit"])


def test_quantized_beam_export_roundtrip(tmp_path):
    """Quantized beam artifact == in-process beam decode over the
    dequantized params (exactness of the export mechanism, independent
    of quantization's accuracy effect)."""
    from ast_tpu.ops.beam import make_beam_decoder
    from ast_tpu.serving import dequantize_params, quantize_params

    mcfg = _mcfg()
    params, state = seq2seq.init_model(jax.random.PRNGKey(5), mcfg)
    B, T, N, K, stop = 2, 40, 2, 2, 6
    X = np.random.RandomState(6).randn(B, T, 13).astype(np.float32)

    exp = serving.export_beam(params, state, mcfg, B, T, N, K, stop,
                              platforms=("cpu",), quantize=True,
                              q_min_size=64)
    path = str(tmp_path / "beam_q8.jaxexp")
    serving.save_artifact(exp, path)
    hyps, scores, lengths = serving.load_artifact(path).call(X)

    deq = dequantize_params(quantize_params(params, min_size=64))
    decode = make_beam_decoder(serving._portable_mcfg(mcfg), N, K, stop)
    ref_hyps, ref_scores, ref_lengths = decode(deq, state, X)
    np.testing.assert_array_equal(np.asarray(hyps), np.asarray(ref_hyps))
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(ref_scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(lengths),
                                  np.asarray(ref_lengths))


ALIGNED_MCFG = {
    # smallest model that passes the REAL fused-kernel alignment gates
    # (H/E/A % 128, Vp -> 128): native export must lower the Mosaic
    # kernels, not the XLA fallback
    "dropout": {"embed": 0.0, "rnn": 0.0, "out": 0},
    "rnn_config": {
        "bi_rnn": True, "enc_layers": 1, "dec_layers": 1,
        "hidden_units": 128, "embedding_units": 128, "attn_units": 128,
        "n_attn": 1, "feed_attn": True, "ln": False,
        "dec_vocab_size": 100,
    },
    "cnn_config": {
        "bn": True,
        "cnn_layers": [
            {"in_channels": None, "out_channels": 64, "ksize": [3, 13],
             "stride": [2, 13], "pad": [1, 0]},
            {"in_channels": None, "out_channels": 128, "ksize": [3, 1],
             "stride": [2, 1], "pad": [1, 0]},
        ],
    },
}


def test_native_kernel_export_bakes_mosaic_kernels():
    """--native-kernels artifacts: TPU-only platform set, the fused
    Mosaic decoders actually lowered (tpu_custom_call in the module —
    jax.export's guaranteed-stable list), serialize/deserialize
    roundtrip, and a portability-violating platform set is rejected.
    Execution is measured on the real chip (scripts/serving_bench.py
    --native; BASELINE.md)."""
    import pytest
    import jax.numpy as jnp
    from jax import export as jax_export

    mcfg = copy.deepcopy(ALIGNED_MCFG)
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)

    exp = serving.export_greedy(params, state, mcfg, 8, 32, 6,
                                jnp.bfloat16, ["tpu"], native=True)
    assert exp.platforms == ("tpu",)
    assert "tpu_custom_call" in exp.mlir_module()

    bexp = serving.export_beam(params, state, mcfg, 8, 32, 2, 2, 6,
                               jnp.bfloat16, ["tpu"], native=True)
    assert bexp.platforms == ("tpu",)
    assert "tpu_custom_call" in bexp.mlir_module()
    again = jax_export.deserialize(bytearray(bexp.serialize()))
    assert again.platforms == ("tpu",)

    # the portable export of the same model carries NO custom calls
    port = serving.export_greedy(params, state, mcfg, 8, 32, 6,
                                 jnp.bfloat16, ["cpu", "tpu"])
    assert "tpu_custom_call" not in port.mlir_module()

    with pytest.raises(ValueError, match="TPU-only"):
        serving.export_greedy(params, state, mcfg, 8, 32, 6,
                              jnp.bfloat16, ["cpu", "tpu"], native=True)
