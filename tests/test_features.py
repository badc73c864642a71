"""Feature pipeline: MFCC matmul-DFT parity, CMVN, ark readers, native
parser parity."""

import os
import pickle

import numpy as np
import pytest

from ast_tpu.data import kaldi_ark
from ast_tpu.ops import fbank


def test_dft_matches_rfft():
    cfg = fbank.MfccConfig()
    ext = fbank.MfccExtractor(cfg)
    rng = np.random.RandomState(0)
    frame = rng.randn(cfg.frame_len).astype(np.float32)
    cos_b, sin_b = np.asarray(ext.consts[0]), np.asarray(ext.consts[1])
    re = frame @ cos_b
    im = frame @ sin_b
    ref = np.fft.rfft(frame, n=cfg.n_fft)
    np.testing.assert_allclose(re, ref.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(im, ref.imag, rtol=1e-3, atol=1e-3)
    power = re**2 + im**2
    np.testing.assert_allclose(power, np.abs(ref) ** 2, rtol=1e-3, atol=1e-2)


def test_mfcc_shapes_and_framing():
    cfg = fbank.MfccConfig()  # 8kHz: 200-sample frames, 80 shift
    assert cfg.frame_len == 200 and cfg.shift == 80 and cfg.n_fft == 256
    ext = fbank.MfccExtractor(cfg)
    audio = np.random.RandomState(0).randn(2, 8000).astype(np.float32)
    feats = np.asarray(ext(audio))
    # 1 + (8000-200)//80 = 98 frames of 13 ceps
    assert feats.shape == (2, 98, 13)
    assert np.isfinite(feats).all()


FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "kaldi_mfcc.npz")


@pytest.mark.parametrize(
    "name", ["tones", "noise", "chirp", "silence_then_tone"])
def test_mfcc_matches_kaldi_golden(name):
    """Golden parity against committed fixtures from an independent
    per-frame Kaldi-pipeline implementation (scripts/make_kaldi_fixtures.py
    — reference conf: linking_files/fisher/mfcc.conf + Kaldi defaults,
    dither off).  Tolerance is f32-matmul-DFT level; an algorithmic
    divergence (window shape, mel edges, lifter, floor) is O(1)."""
    z = np.load(FIXTURES)
    got = np.asarray(fbank.MfccExtractor()(z[f"audio_{name}"][None]))[0]
    np.testing.assert_allclose(got, z[f"mfcc_{name}"], rtol=0, atol=0.03)


def test_cmvn_matches_kaldi_golden():
    """compute_cmvn_stats/apply_cmvn vs the fixture generator's
    independent sum/sumsq accumulation (apply-cmvn --norm-vars=true
    over one speaker's two utterances)."""
    z = np.load(FIXTURES)
    mats = [z["mfcc_tones"], z["mfcc_noise"]]
    stats = fbank.compute_cmvn_stats(mats)
    np.testing.assert_allclose(stats["mean"], z["cmvn_mean"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(stats["std"], z["cmvn_std"],
                               rtol=1e-4, atol=1e-4)
    for mat, key in zip(mats, ["cmvn_tones", "cmvn_noise"]):
        got = np.asarray(fbank.apply_cmvn(mat, stats))
        np.testing.assert_allclose(got, z[key], rtol=1e-3, atol=1e-3)


def test_cmvn_roundtrip():
    rng = np.random.RandomState(0)
    arrays = [rng.randn(50, 13) * 3 + 5 for _ in range(4)]
    stats = fbank.compute_cmvn_stats(arrays)
    normed = np.concatenate(
        [np.asarray(fbank.apply_cmvn(a, stats)) for a in arrays])
    assert abs(normed.mean()) < 1e-4
    assert abs(normed.std() - 1.0) < 1e-3


def _write_text_ark(path, items):
    with open(path, "w") as f:
        for utt, mat in items:
            f.write(f"{utt}  [\n")
            for i, row in enumerate(mat):
                tail = " ]" if i == len(mat) - 1 else ""
                f.write("  " + " ".join(f"{v:.6g}" for v in row) + tail + "\n")


@pytest.fixture
def ark_items():
    rng = np.random.RandomState(0)
    return [
        ("conv1-A-1", rng.randn(5, 13).astype(np.float32)),
        ("conv1-A-2", rng.randn(3, 13).astype(np.float32)),
        ("conv2-B-1", rng.randn(7, 13).astype(np.float32)),
    ]


def test_text_ark_roundtrip(tmp_path, ark_items):
    path = str(tmp_path / "test.ark")
    _write_text_ark(path, ark_items)
    got = list(kaldi_ark._read_text_ark_py(path))
    assert [u for u, _ in got] == [u for u, _ in ark_items]
    for (u1, m1), (u2, m2) in zip(got, ark_items):
        np.testing.assert_allclose(m1, m2, rtol=1e-5)


def test_native_parser_matches_python(tmp_path, ark_items):
    from ast_tpu.native import fast_text_ark
    if fast_text_ark is None:
        pytest.skip("native parser unavailable (no g++)")
    path = str(tmp_path / "test.ark")
    _write_text_ark(path, ark_items)
    py = list(kaldi_ark._read_text_ark_py(path))
    cc = list(fast_text_ark(path))
    assert [u for u, _ in py] == [u for u, _ in cc]
    for (_, m1), (_, m2) in zip(py, cc):
        np.testing.assert_allclose(m1, m2, rtol=1e-5)


def test_native_parser_fuzz_exact_agreement(tmp_path):
    """Randomized arks: the C++ parser must agree with the Python parser
    BIT-exactly (both produce float32 from the same text), across random
    shapes, scientific notation, subnormals, negative zero, and extreme
    magnitudes."""
    from ast_tpu.native import fast_text_ark
    if fast_text_ark is None:
        pytest.skip("native parser unavailable (no g++)")
    rng = np.random.RandomState(1234)
    for trial in range(10):
        D = int(rng.randint(1, 40))
        items = []
        for k in range(int(rng.randint(1, 6))):
            T = int(rng.randint(1, 30))
            mat = (rng.randn(T, D) *
                   10.0 ** rng.randint(-30, 30, (T, D))).astype(np.float32)
            # sprinkle edge values
            flat = mat.ravel()
            idx = rng.randint(0, flat.size, min(6, flat.size))
            flat[idx] = np.array(
                [0.0, -0.0, 1e-38, -1e38, 3.4e38, 1.1754944e-38],
                np.float32)[: len(idx)]
            items.append((f"utt_{trial}-{k}-x", mat))
        path = str(tmp_path / f"fuzz{trial}.ark")
        with open(path, "w") as f:
            for utt, mat in items:
                f.write(f"{utt}  [\n")
                for i, row in enumerate(mat):
                    tail = " ]" if i == len(mat) - 1 else ""
                    f.write("  " + " ".join(repr(float(v)) for v in row)
                            + tail + "\n")
        py = list(kaldi_ark._read_text_ark_py(path))
        cc = list(fast_text_ark(path))
        assert [u for u, _ in py] == [u for u, _ in cc]
        for (_, m1), (_, m2) in zip(py, cc):
            np.testing.assert_array_equal(m1, m2)


def test_ragged_ark_falls_back_to_python(tmp_path):
    """Mixed-dims arks bypass the flat C++ layout instead of misaligning.

    The native parser assumes one rectangular column count per file; a
    ragged ark must be rejected eagerly (ValueError, before any item is
    yielded) and read_text_ark must transparently serve it through the
    per-matrix Python parser.
    """
    rng = np.random.RandomState(1)
    items = [
        ("u1", rng.randn(4, 13).astype(np.float32)),
        ("u2", rng.randn(3, 42).astype(np.float32)),  # different dim
    ]
    path = str(tmp_path / "ragged.ark")
    _write_text_ark(path, items)

    from ast_tpu.native import fast_text_ark
    if fast_text_ark is not None:
        with pytest.raises(ValueError):
            fast_text_ark(path)

    got = list(kaldi_ark.read_text_ark(path))
    assert [u for u, _ in got] == ["u1", "u2"]
    for (_, m1), (_, m2) in zip(got, items):
        np.testing.assert_allclose(m1, m2, rtol=1e-5)


def test_binary_ark_roundtrip(tmp_path, ark_items):
    path = str(tmp_path / "test_bin.ark")
    kaldi_ark.write_binary_ark(path, ark_items)
    got = list(kaldi_ark.read_binary_ark(path))
    assert [u for u, _ in got] == [u for u, _ in ark_items]
    for (_, m1), (_, m2) in zip(got, ark_items):
        np.testing.assert_array_equal(m1, m2)


def test_conversation_pickles(tmp_path, ark_items):
    path = str(tmp_path / "test.ark")
    _write_text_ark(path, ark_items)
    out = str(tmp_path / "convs")
    n = kaldi_ark.ark_to_conversation_pickles(path, out)
    assert n == 2
    with open(os.path.join(out, "conv1.np"), "rb") as f:
        conv1 = pickle.load(f)
    assert set(conv1.keys()) == {"conv1-A-1", "conv1-A-2"}
    np.testing.assert_allclose(conv1["conv1-A-1"], ark_items[0][1],
                               rtol=1e-5)


def test_merge_segments(ark_items):
    merged = kaldi_ark.merge_segments([m for _, m in ark_items[:2]])
    assert merged.shape == (8, 13)


def test_text_ark_closing_bracket_on_own_line(tmp_path):
    """Kaldi's reader is whitespace-insensitive: a final ']' on its own
    line must parse, not append a ragged empty row."""
    path = str(tmp_path / "ownline.ark")
    with open(path, "w") as f:
        f.write("utt1  [\n  1.0 2.0\n  3.0 4.0\n  ]\n")
    got = list(kaldi_ark._read_text_ark_py(path))
    assert len(got) == 1 and got[0][0] == "utt1"
    np.testing.assert_allclose(got[0][1],
                               [[1.0, 2.0], [3.0, 4.0]], rtol=1e-6)


def test_conversation_pickles_noncontiguous(tmp_path, ark_items):
    """A conversation whose utterances reappear later in the ark
    (merged/unsorted copy) must MERGE with its earlier flush, not
    silently overwrite it."""
    shuffled = [ark_items[0], ark_items[2], ark_items[1]]  # conv1 split
    path = str(tmp_path / "shuffled.ark")
    _write_text_ark(path, shuffled)
    out = str(tmp_path / "convs")
    n = kaldi_ark.ark_to_conversation_pickles(path, out)
    assert n == 2                       # unique conversations, not flushes
    with open(os.path.join(out, "conv1.np"), "rb") as f:
        conv1 = pickle.load(f)
    assert set(conv1.keys()) == {"conv1-A-1", "conv1-A-2"}
    np.testing.assert_allclose(conv1["conv1-A-1"], ark_items[0][1],
                               rtol=1e-5)


def test_native_parser_digits_only_utt_id(tmp_path):
    """A digits-only utterance id must stay an id — the single-pass C
    parser used to consume it as a float datum, silently folding the id
    into the feature data for single-row single-utterance arks."""
    from ast_tpu import native

    items = [("123", np.asarray([[5.0, 6.0]], np.float32)),
             ("457", np.asarray([[1.0, 2.0], [3.0, 4.0]], np.float32))]
    path = str(tmp_path / "digits.ark")
    _write_text_ark(path, items)
    got = list(kaldi_ark.read_text_ark(path))
    assert [u for u, _ in got] == ["123", "457"]
    for (u1, m1), (u2, m2) in zip(got, items):
        np.testing.assert_allclose(m1, m2, rtol=1e-6)
    # the native fast path itself (not the Python fallback) must agree
    if native.fast_text_ark is not None:    # skip only if no toolchain
        fast = list(native.fast_text_ark(path))
        assert [u for u, _ in fast] == ["123", "457"]
        np.testing.assert_allclose(fast[0][1], items[0][1], rtol=1e-6)
