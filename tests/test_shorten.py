"""Shorten v2 codec: round-trip, committed goldens, read_sph
integration, extract-segments, and a libavcodec cross-check proving
the bitstream is the real-world format (reference decodes these files
with the external sph2pipe; here it's native — reference:
linking_files/fisher/kaldi/local/fsp_data_prep.sh:37-41)."""

import os
import struct
import subprocess

import numpy as np
import pytest

from ast_tpu.data import shorten as sh
from ast_tpu.data.wav_loader import extract_segments, read_sph

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "shorten")


def _sig(n=4000, seed=0, scale=2000.0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    x = scale * np.sin(t / 25.0) + rng.randint(-100, 100, n)
    return np.stack([x, np.roll(x, 3)], axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# round-trip
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ftype", [
    sh.TYPE_S16LH, sh.TYPE_S16HL, sh.TYPE_U16LH, sh.TYPE_U16HL,
    sh.TYPE_S8, sh.TYPE_U8])
def test_roundtrip_linear_types(ftype):
    x = _sig()
    if ftype in (sh.TYPE_U16LH, sh.TYPE_U16HL):
        x = x + 0x8000
    elif ftype == sh.TYPE_U8:
        x = (x % 200) + 28
    elif ftype == sh.TYPE_S8:
        x = np.clip(x // 32, -128, 127)
    st = sh.decode(sh.encode(x, ftype))
    assert st.ftype == ftype and st.nchan == 2
    np.testing.assert_array_equal(st.samples, x)


@pytest.mark.parametrize("kw", [
    {"use_qlpc": True, "predictors": (sh.FN_QLPC,)},
    {"predictors": (sh.FN_DIFF0,)},
    {"predictors": (sh.FN_DIFF1,)},
    {"predictors": (sh.FN_DIFF2,)},
    {"predictors": (sh.FN_DIFF3,)},
    {"nmean": 0}, {"nmean": 1}, {"nmean": 4},
    {"blocksize": 64}, {"blocksize": 100},
    {"bitshift": 2},
])
def test_roundtrip_every_predictor_and_option(kw):
    x = _sig()
    if kw.get("bitshift"):
        x &= ~3
    st = sh.decode(sh.encode(x, sh.TYPE_S16LH, **kw))
    np.testing.assert_array_equal(st.samples, x)


def test_roundtrip_ulaw_family():
    x = _sig()
    codes = sh._nearest_code(x.reshape(-1), sh._ULAW_EXPAND)
    for ftype in (sh.TYPE_AU1, sh.TYPE_AU2):
        internal = sh._SIGNMAG_IN[codes].reshape(x.shape)
        st = sh.decode(sh.encode(internal, ftype))
        np.testing.assert_array_equal(st.samples, internal)
        # byte serialization inverts the inward map exactly
        back = np.frombuffer(sh.samples_to_bytes(st), dtype=np.uint8)
        np.testing.assert_array_equal(back, codes)
    internal = sh._ULAW_EXPAND[codes].reshape(x.shape)
    st = sh.decode(sh.encode(internal, sh.TYPE_ULAW))
    back = np.frombuffer(sh.samples_to_bytes(st), dtype=np.uint8)
    # TYPE_ULAW goes through the (non-injective at zero) G.711 linear
    # expansion: negative-zero codes (0x7f) normalize to positive zero
    # (0xff) — the real codec's documented ULAW behavior; the decoded
    # AUDIO is exact
    np.testing.assert_array_equal(sh._ULAW_EXPAND[back],
                                  sh._ULAW_EXPAND[codes])


def test_zero_blocks_and_verbatim_and_partial_tail():
    x = np.zeros((700, 1), dtype=np.int64)  # not a blocksize multiple
    x[300:400] = 1234
    data = sh.encode(x, sh.TYPE_S16LH, verbatim=b"HDRxyz", nmean=0)
    st = sh.decode(data)
    assert st.verbatim == b"HDRxyz"
    np.testing.assert_array_equal(st.samples, x)


def test_max_samples_early_stop():
    x = _sig(8000)
    data = sh.encode(x, sh.TYPE_S16LH)
    st = sh.decode(data, max_samples=1000)
    assert len(st.samples) >= 1000
    np.testing.assert_array_equal(st.samples, x[: len(st.samples)])


def test_errors():
    with pytest.raises(ValueError, match="magic"):
        sh.decode(b"nope" + b"\x00" * 100)
    with pytest.raises(ValueError, match="version"):
        sh.decode(sh.MAGIC + bytes([9]) + b"\x00" * 100)
    x = _sig(1000)
    data = sh.encode(x, sh.TYPE_S16LH)
    with pytest.raises(ValueError, match="truncated"):
        sh.decode(data[: len(data) // 2])


# ---------------------------------------------------------------------------
# committed goldens through read_sph (the VERDICT's done-bar)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["fisher_like", "pcm_like"])
def test_read_sph_decodes_embedded_shorten_golden(name):
    exp = np.load(os.path.join(FIX, f"{name}_expected.npy"))
    for ch in (0, 1):
        x, rate = read_sph(os.path.join(FIX, f"{name}.sph"),
                           channel=ch, with_rate=True)
        assert rate == 8000
        np.testing.assert_array_equal(x, exp[:, ch].astype(np.float32))
    x = read_sph(os.path.join(FIX, f"{name}.sph"))
    np.testing.assert_array_equal(
        x, exp.mean(axis=1).astype(np.float32))


def test_extract_segments_from_shorten_sphere(tmp_path):
    """Audio-domain extract-segments straight off a shorten tape —
    raw-LDC-layout to per-utterance npy with zero external tools."""
    audio_dir = tmp_path / "audio"
    out_dir = tmp_path / "utts"
    audio_dir.mkdir()
    import shutil
    shutil.copy(os.path.join(FIX, "fisher_like.sph"),
                audio_dir / "conv1.sph")
    segs = tmp_path / "segments"
    segs.write_text("utt_a conv1 0.05 0.30\nutt_b conv1 0.40 0.70\n")
    n = extract_segments(str(segs), str(audio_dir), str(out_dir),
                         channel_map={"conv1": 1}, rate=8000)
    assert n == 2
    exp = np.load(os.path.join(FIX, "fisher_like_expected.npy"))[:, 1]
    a = np.load(out_dir / "utt_a.npy")
    np.testing.assert_array_equal(a, exp[400:2400].astype(np.float32))
    b = np.load(out_dir / "utt_b.npy")
    np.testing.assert_array_equal(b, exp[3200:5600].astype(np.float32))


# ---------------------------------------------------------------------------
# libavcodec cross-check: our streams are the real format
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def shn_oracle(tmp_path_factory):
    """Build the FFmpeg-based decoder oracle; skip if unavailable."""
    src = os.path.join(os.path.dirname(__file__), "support",
                       "shn_decode.c")
    exe = str(tmp_path_factory.mktemp("oracle") / "shn_decode")
    r = subprocess.run(
        ["gcc", "-O2", "-o", exe, src, "-lavformat", "-lavcodec",
         "-lavutil"], capture_output=True)
    if r.returncode != 0:
        pytest.skip("libavformat/libavcodec toolchain unavailable: "
                    + r.stderr.decode()[:200])
    return exe


def _wav_header(n, nchan, rate=8000, bits=16):
    ba = nchan * bits // 8
    ds = n * ba
    return (b"RIFF" + struct.pack("<I", 36 + ds) + b"WAVE"
            b"fmt " + struct.pack("<IHHIIHH", 16, 1, nchan, rate,
                                  rate * ba, ba, bits)
            + b"data" + struct.pack("<I", ds))


def _ffmpeg_decode(exe, data, tmp_path, dtype="<i2", nchan=2):
    shn = tmp_path / "t.shn"
    raw = tmp_path / "t.raw"
    shn.write_bytes(data)
    r = subprocess.run([exe, str(shn), str(raw)], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-300:]
    return np.frombuffer(raw.read_bytes(), dtype=dtype).astype(
        np.int64).reshape(-1, nchan)


@pytest.mark.parametrize("kw", [
    {}, {"use_qlpc": True, "predictors": (sh.FN_QLPC,)},
    {"predictors": (sh.FN_DIFF0,)}, {"predictors": (sh.FN_DIFF3,)},
    {"nmean": 0}, {"nmean": 1}, {"bitshift": 2}, {"blocksize": 64},
])
def test_ffmpeg_decodes_our_streams(shn_oracle, tmp_path, kw):
    x = _sig()
    if kw.get("bitshift"):
        x &= ~3
    data = sh.encode(x, sh.TYPE_S16LH, verbatim=_wav_header(len(x), 2),
                     **kw)
    got = _ffmpeg_decode(shn_oracle, data, tmp_path)
    np.testing.assert_array_equal(got, x)


def test_ffmpeg_decodes_committed_golden(shn_oracle, tmp_path):
    data = open(os.path.join(FIX, "raw_s16.shn"), "rb").read()
    exp = np.load(os.path.join(FIX, "raw_s16_expected.npy"))
    got = _ffmpeg_decode(shn_oracle, data, tmp_path)
    np.testing.assert_array_equal(got, exp.astype(np.int64))
    # and our own decoder agrees with libavcodec on the same bytes
    st = sh.decode(data)
    np.testing.assert_array_equal(st.samples, got)


# ---------------------------------------------------------------------------
# native (C++) decoder equivalence
# ---------------------------------------------------------------------------

def _native_available():
    try:
        from ast_tpu.native import fast_shn_decode
        return fast_shn_decode is not None
    except Exception:
        return False


@pytest.mark.skipif(not _native_available(),
                    reason="native toolchain unavailable")
@pytest.mark.parametrize("kw", [
    {}, {"use_qlpc": True, "predictors": (sh.FN_QLPC,)},
    {"predictors": (sh.FN_DIFF0,)}, {"predictors": (sh.FN_DIFF1,)},
    {"predictors": (sh.FN_DIFF2,)}, {"predictors": (sh.FN_DIFF3,)},
    {"nmean": 0}, {"nmean": 1}, {"bitshift": 2}, {"blocksize": 64},
    {"verbatim": b"HDR\x00\xffbytes"},
])
def test_native_matches_python(kw):
    """ast_tpu/native/shorten_dec.cc == the Python reference, sample
    for sample and verbatim byte for verbatim byte."""
    x = _sig(3000, seed=7)
    if kw.get("bitshift"):
        x &= ~3
    data = sh.encode(x, sh.TYPE_S16LH, **kw)
    st_py = sh.decode(data, _force_python=True)
    st_c = sh.decode(data)
    assert st_c.ftype == st_py.ftype and st_c.nchan == st_py.nchan
    np.testing.assert_array_equal(st_c.samples, st_py.samples)
    assert st_c.verbatim == st_py.verbatim
    np.testing.assert_array_equal(st_c.samples, x)


@pytest.mark.skipif(not _native_available(),
                    reason="native toolchain unavailable")
def test_native_error_paths():
    from ast_tpu.native import fast_shn_decode
    with pytest.raises(ValueError, match="magic"):
        fast_shn_decode(b"nope" + b"\x00" * 50, None)
    x = _sig(1000)
    data = sh.encode(x, sh.TYPE_S16LH)
    with pytest.raises(ValueError, match="truncated"):
        fast_shn_decode(data[: len(data) // 2], None)
