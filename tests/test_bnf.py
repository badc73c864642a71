"""nnet2 BNF forward: parser + component math vs hand-computed NumPy.

The reference dumps 42-dim bottleneck features with Kaldi's nnet2 C++
binaries (reference: create_bnfs.sh:46-53); ast_tpu runs the same net in
JAX (ast_tpu/ops/bnf.py).  The model here is synthetic text in Kaldi's
nnet2 format — Splice -> Affine -> Pnorm -> Normalize -> FixedAffine
(the bottleneck) — with every expected value derived independently.
"""

import numpy as np
import pytest

from ast_tpu.ops import bnf


def _matrix_text(m):
    return "[\n" + "\n".join(
        "  " + " ".join(f"{v:.9e}" for v in row) for row in m) + " ]"


def _vector_text(v):
    return "[ " + " ".join(f"{v_:.9e}" for v_ in v) + " ]"


@pytest.fixture
def net_text():
    rng = np.random.RandomState(0)
    d_in, d_aff, d_pnorm, d_bnf = 3, 8, 4, 2
    ctx = [-1, 0, 1]
    W1 = rng.randn(d_aff, d_in * len(ctx)).astype(np.float32)
    b1 = rng.randn(d_aff).astype(np.float32)
    W2 = rng.randn(d_bnf, d_pnorm).astype(np.float32)
    b2 = rng.randn(d_bnf).astype(np.float32)
    text = f"""<Nnet> <NumComponents> 5 <Components>
<SpliceComponent> <InputDim> {d_in} <Context> [ -1 0 1 ]
<ConstComponentDim> 0 </SpliceComponent>
<AffineComponentPreconditioned> <LearningRate> 0.001 <Alpha> 4.0
<MaxChange> 10 <LinearParams> {_matrix_text(W1)}
<BiasParams> {_vector_text(b1)} </AffineComponentPreconditioned>
<PnormComponent> <InputDim> {d_aff} <OutputDim> {d_pnorm} <P> 2
</PnormComponent>
<NormalizeComponent> <Dim> {d_pnorm} <ValueAvg> [ ] <DerivAvg> [ ]
<Count> 0 </NormalizeComponent>
<FixedAffineComponent> <LinearParams> {_matrix_text(W2)}
<BiasParams> {_vector_text(b2)} </FixedAffineComponent>
</Components> </Nnet>"""
    return text, (W1, b1, W2, b2)


def test_parse_and_forward_matches_numpy(net_text):
    text, (W1, b1, W2, b2) = net_text
    comps = bnf.parse_nnet2_text(text)
    assert [c["type"] for c in comps] == [
        "SpliceComponent", "AffineComponent", "PnormComponent",
        "NormalizeComponent", "FixedAffineComponent"]
    np.testing.assert_allclose(comps[1]["linear"], W1)

    rng = np.random.RandomState(1)
    x = rng.randn(6, 3).astype(np.float32)
    got = np.asarray(bnf.nnet2_forward(comps, x))

    # hand computation
    T = x.shape[0]
    spliced = np.stack([
        np.concatenate([x[max(0, t - 1)], x[t], x[min(T - 1, t + 1)]])
        for t in range(T)])
    h = spliced @ W1.T + b1
    g = h.reshape(T, 4, 2)
    pn = np.sqrt((g ** 2).sum(-1))
    norm = pn / np.sqrt((pn ** 2).mean(-1, keepdims=True))
    want = norm @ W2.T + b2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == (6, 2)


def test_splice_const_component_dim():
    comps = [{"type": "SpliceComponent", "context": [-1, 0],
              "ConstComponentDim": 1}]
    x = np.asarray([[1., 10.], [2., 20.], [3., 30.]], np.float32)
    got = np.asarray(bnf.nnet2_forward(comps, x))
    # per frame: [main[t-1], main[t], const[t]]
    want = np.asarray([[1, 1, 10], [1, 2, 20], [2, 3, 30]], np.float32)
    np.testing.assert_allclose(got, want)


def test_activations_and_fixed_scale_bias():
    text = """<Nnet> <NumComponents> 4 <Components>
    <SigmoidComponent> <Dim> 2 </SigmoidComponent>
    <TanhComponent> <Dim> 2 </TanhComponent>
    <FixedScaleComponent> <Scales> [ 2.0 3.0 ] </FixedScaleComponent>
    <FixedBiasComponent> <Bias> [ -1.0 1.0 ] </FixedBiasComponent>
    </Components> </Nnet>"""
    comps = bnf.parse_nnet2_text(text)
    x = np.asarray([[0.5, -0.25]], np.float32)
    got = np.asarray(bnf.nnet2_forward(comps, x))
    want = np.tanh(1 / (1 + np.exp(-x))) * [2.0, 3.0] + [-1.0, 1.0]
    np.testing.assert_allclose(got, want, rtol=1e-5)  # f32 vs f64 math


def test_add_deltas_matches_regression():
    rng = np.random.RandomState(2)
    x = rng.randn(10, 3).astype(np.float32)
    got = np.asarray(bnf.add_deltas(x, order=1, window=2))
    assert got.shape == (10, 6)
    # interior frame: least-squares slope over +-2
    t = 5
    want = (1 * (x[t + 1] - x[t - 1]) + 2 * (x[t + 2] - x[t - 2])) / 10.0
    np.testing.assert_allclose(got[t, 3:], want, rtol=1e-5)
    # delta-delta default shape
    assert np.asarray(bnf.add_deltas(x)).shape == (10, 9)


def test_lda_front_end():
    rng = np.random.RandomState(3)
    x = rng.randn(5, 2).astype(np.float32)
    sp = np.asarray(bnf.splice_frames(x, left=1, right=1))
    assert sp.shape == (5, 6)
    np.testing.assert_allclose(sp[0], np.concatenate([x[0], x[0], x[1]]))
    # affine transform (out, in+1): trailing offset column
    mat = rng.randn(3, 7).astype(np.float32)
    got = np.asarray(bnf.apply_transform(sp, mat))
    np.testing.assert_allclose(got, sp @ mat[:, :-1].T + mat[:, -1],
                               rtol=1e-5)


def test_prep_data_bnf_cli(tmp_path, net_text):
    text, _ = net_text
    model = tmp_path / "final.txt"
    model.write_text(text)
    feat_dir = tmp_path / "feats"
    out_dir = tmp_path / "bnf"
    feat_dir.mkdir()
    rng = np.random.RandomState(4)
    for i in range(3):
        np.save(feat_dir / f"utt{i}.npy",
                rng.randn(7 + i, 3).astype(np.float32))
    from ast_tpu.cli.prep_data import main
    main(["bnf", str(feat_dir), str(out_dir), "--model", str(model)])
    for i in range(3):
        out = np.load(out_dir / f"utt{i}.npy")
        assert out.shape == (7 + i, 2)
        assert np.isfinite(out).all()
