"""On-device feature pipeline: raw audio -> MFCC+CMVN fused in the step."""

import json
import os
import pickle

import numpy as np
import pytest

from ast_tpu.data.wav_loader import (
    WavDataLoader, read_wav, samples_for_frames,
)
from ast_tpu.ops.fbank import MfccConfig
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG


@pytest.fixture
def wav_exp(tmp_path):
    """Tiny experiment whose speech is raw 8 kHz audio."""
    rng = np.random.RandomState(0)
    cfg = MfccConfig()
    exp = tmp_path / "exp"
    data = tmp_path / "data"
    speech = tmp_path / "speech"
    exp.mkdir()
    data.mkdir()

    words = [f"w{i}".encode() for i in range(6)]
    w2i = {w: i for i, w in enumerate(SYMBOLS.START_VOCAB + words)}
    vocab = {"en_w": {"w2i": w2i,
                      "i2w": {i: w for w, i in w2i.items()}, "freq": {}}}

    map_dict, info = {}, {}
    utt2spk, stats = {}, {}
    for set_key, n in [("wav_train", 6), ("wav_dev", 3)]:
        map_dict[set_key] = {}
        info[set_key] = {}
        os.makedirs(speech / set_key, exist_ok=True)
        for i in range(n):
            utt = f"{set_key}_u{i}"
            spk = f"spk{i % 2}"
            n_fr = int(rng.randint(20, 90))
            S = samples_for_frames(cfg, n_fr)
            audio = rng.randn(S).astype(np.float32) * 0.1
            np.save(speech / set_key / f"{utt}.npy", audio)
            toks = [words[rng.randint(6)] for _ in range(rng.randint(2, 5))]
            map_dict[set_key][utt] = {"en_w": toks}
            info[set_key][utt] = {"sp": n_fr, "en_w": len(toks)}
            utt2spk[utt] = spk
    for spk in ["spk0", "spk1"]:
        stats[spk] = {"mean": rng.randn(13).astype(np.float32) * 0.1,
                      "std": np.ones(13, np.float32)}
    with open(speech / "cmvn.stats", "wb") as f:
        pickle.dump({"utt2spk": utt2spk, "stats": stats}, f)

    for name, obj in [("v", vocab), ("m", map_dict), ("i", info)]:
        with open(data / name, "wb") as f:
            pickle.dump(obj, f)

    refs = data / "refs" / "wav_dev"
    os.makedirs(refs, exist_ok=True)
    dev = sorted(map_dict["wav_dev"])
    (refs / "eval.ids").write_text("\n".join(dev) + "\n")
    (refs / "ref.en0").write_text("\n".join(
        " ".join(w.decode() for w in map_dict["wav_dev"][u]["en_w"])
        for u in dev) + "\n")

    train_cfg = {
        "seed": "wav-seed", "iters_save": 5,
        "train_set": "wav_train", "dev_set": "wav_dev",
        "extras": {"random_out": 0, "speech_noise": 0, "teach_ratio": 1.0},
        "data": {
            "enc_key": "sp", "dec_key": "en_w",
            "features": "wav",
            "speech_path": str(speech),
            "map_path": str(data / "m"), "vocab_path": str(data / "v"),
            "info_path": str(data / "i"),
            "refs_path": str(data / "refs"),
            "max_pred": 10, "n_evals": 1,
            "buckets_num": 3, "buckets_width": 32,
            "train_scale": 1, "zero_input": 0,
            "target_pad_multiple": 4,
        },
        "optimizer": {"type": 0, "lr": 0.01, "l2": 0, "grad_clip": 2,
                      "grad_noise_eta": 0, "freeze": []},
        "batch_size": 3,
    }
    with open(exp / "model_cfg.json", "w") as f:
        json.dump(TINY_MODEL_CFG, f)
    with open(exp / "train_cfg.json", "w") as f:
        json.dump(train_cfg, f)
    return str(exp)


def test_wav_loader_batches(wav_exp):
    from ast_tpu.config import Config
    cfg = Config(wav_exp)
    dl = WavDataLoader(cfg.train["data"], wav_exp, seed="s")
    mfcc = MfccConfig()
    n = 0
    for b in dl.get_batch(3, "wav_train", train=True, labels=True):
        T = b["n_frames"]
        assert b["audio"].shape == (3, samples_for_frames(mfcc, T))
        assert b["cmvn_mean"].shape == (3, 13)
        assert b["y"][0, 0] == SYMBOLS.GO_ID
        assert "X" not in b
        n += b["n_real"]
    assert n == 6


@pytest.mark.slow
def test_wav_train_end_to_end(wav_exp):
    """Full harness: on-device MFCC+CMVN fused into the train step."""
    from ast_tpu.train.trainer import NN
    nn = NN(wav_exp)
    assert nn.wav_mode
    loss1 = nn.train_epoch("wav_train", epoch=1)
    loss2 = nn.train_epoch("wav_train", epoch=2)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    preds = nn.predict("wav_dev")
    assert len(preds) == 3
    hyps = nn.data_loader.get_hyps(preds)
    assert len(hyps) == 3


def test_read_wav_roundtrip(tmp_path):
    import wave
    path = str(tmp_path / "t.wav")
    x = (np.sin(np.linspace(0, 100, 800)) * 20000).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.tobytes())
    y = read_wav(path)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0,
                               atol=1e-6)


def test_read_wav_24bit_and_width_validation(tmp_path):
    """24-bit PCM decodes exactly; unknown widths raise instead of being
    silently misread as unsigned 8-bit garbage."""
    import wave
    path = str(tmp_path / "t24.wav")
    vals = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321],
                    dtype=np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(raw)
    y = read_wav(path)
    np.testing.assert_allclose(
        y, vals.astype(np.float32) / 8388608.0, atol=1e-9)

    # stdlib wave won't WRITE width-5 files, so hand-craft the RIFF
    # header to exercise the reader's rejection path
    import struct
    payload = b"\x00" * 40
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                   8000 * 5, 5, 40)
           + b"data" + struct.pack("<I", len(payload)) + payload)
    bad = str(tmp_path / "t5.wav")
    with open(bad, "wb") as f:
        f.write(hdr)
    with pytest.raises(ValueError, match="sample width"):
        read_wav(bad)


def test_channel_out_of_range_raises(tmp_path):
    """A channel_map that names a channel the audio doesn't have must
    fail loudly — slicing channel-mixed audio trains on the wrong
    speaker's side."""
    import wave
    mono = str(tmp_path / "mono.wav")
    with wave.open(mono, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.zeros(80, dtype="<i2").tobytes())
    with pytest.raises(ValueError, match="channel 1"):
        read_wav(mono, channel=1)

    # mono 1-D .npy with a mapped non-zero channel via extract_segments
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    np.save(str(audio_dir / "reco1.npy"),
            np.zeros(16000, dtype=np.float32))
    seg = tmp_path / "segments"
    seg.write_text("utt1 reco1 0.0 1.0\n")
    from ast_tpu.data.wav_loader import extract_segments
    with pytest.raises(ValueError, match="mono"):
        extract_segments(str(seg), str(audio_dir), str(tmp_path / "out"),
                         channel_map={"reco1": 1})
    # channel 0 on mono audio is fine
    n = extract_segments(str(seg), str(audio_dir), str(tmp_path / "out"),
                         channel_map={"reco1": 0})
    assert n == 1


def _write_sph(path, data_bytes, coding="pcm", n_bytes=2, channels=1,
               n_samples=0, byte_format="01"):
    header = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 8000\n"
        f"channel_count -i {channels}\n"
        f"sample_n_bytes -i {n_bytes}\n"
        f"sample_count -i {n_samples}\n"
        f"sample_byte_format -s{len(byte_format)} {byte_format}\n"
        f"sample_coding -s{len(coding)} {coding}\n"
        "end_head\n"
    ).encode("ascii")
    with open(path, "wb") as f:
        f.write(header + b" " * (1024 - len(header)))
        f.write(data_bytes)


def _ulaw_encode(pcm):
    """Textbook G.711 mu-law compressor (test-side reference encoder)."""
    BIAS, CLIP = 0x84, 32635
    x = np.asarray(pcm, np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), CLIP) + BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return np.invert((sign | (exp << 4) | mant).astype(np.uint8))


def test_read_sph_pcm_both_endiannesses(tmp_path):
    from ast_tpu.data.wav_loader import read_sph
    x = (np.sin(np.linspace(0, 60, 500)) * 25000).astype(np.int16)
    le, be = str(tmp_path / "le.sph"), str(tmp_path / "be.sph")
    _write_sph(le, x.astype("<i2").tobytes(), byte_format="01",
               n_samples=len(x))
    _write_sph(be, x.astype(">i2").tobytes(), byte_format="10",
               n_samples=len(x))
    want = x.astype(np.float32) / 32768.0
    np.testing.assert_allclose(read_sph(le), want, atol=1e-6)
    np.testing.assert_allclose(read_sph(be), want, atol=1e-6)


def test_read_sph_ulaw_two_channel(tmp_path):
    from ast_tpu.data.wav_loader import _ulaw_to_linear, read_sph
    # decoder endpoints pinned to the G.711 table
    assert _ulaw_to_linear(np.array([0x00]))[0] == -32124
    assert _ulaw_to_linear(np.array([0x80]))[0] == 32124
    assert _ulaw_to_linear(np.array([0xFF]))[0] == 0

    rng = np.random.RandomState(3)
    ch0 = (rng.randn(400) * 8000).astype(np.int16)
    ch1 = (rng.randn(400) * 8000).astype(np.int16)
    interleaved = np.stack([_ulaw_encode(ch0), _ulaw_encode(ch1)],
                           axis=1).reshape(-1)
    path = str(tmp_path / "u.sph")
    _write_sph(path, interleaved.tobytes(), coding="ulaw", n_bytes=1,
               channels=2, n_samples=400)
    # mu-law is lossy: tolerance = max segment quantization step
    got0 = read_sph(path, channel=0) * 32768.0
    np.testing.assert_allclose(got0, ch0, atol=1024)
    mono = read_sph(path) * 32768.0
    np.testing.assert_allclose(mono, (ch0.astype(np.float32)
                                      + ch1.astype(np.float32)) / 2,
                               atol=1024)


def test_read_sph_rejects_shorten(tmp_path):
    from ast_tpu.data.wav_loader import read_sph
    path = str(tmp_path / "s.sph")
    _write_sph(path, b"\x00" * 64, coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(ValueError, match="shorten"):
        read_sph(path)


def test_wav_loader_reads_sph(wav_exp):
    """An utterance stored as .sph enters the wav pipeline unchanged."""
    from ast_tpu.config import Config
    cfg = Config(wav_exp)
    speech = cfg.train["data"]["speech_path"]
    utt_npy = os.path.join(speech, "wav_train", "wav_train_u0.npy")
    audio = np.load(utt_npy)
    pcm = np.clip(audio * 32768.0, -32768, 32767).astype("<i2")
    _write_sph(os.path.join(speech, "wav_train", "wav_train_u0.sph"),
               pcm.tobytes(), n_samples=len(pcm))
    os.remove(utt_npy)
    dl = WavDataLoader(cfg.train["data"], wav_exp, seed="s")
    x = dl._load_audio("wav_train_u0", "wav_train")
    np.testing.assert_allclose(x, pcm.astype(np.float32) / 32768.0,
                               atol=1e-6)


def test_wav_beam_decode(wav_exp):
    """Beam decode with on-device featurization."""
    from ast_tpu.train.trainer import NN
    nn = NN(wav_exp)
    results = nn.decode_beam_set("wav_dev", N=2, K=2)
    assert len(results) == 3
    for utt, hyps in results.items():
        assert len(hyps) == 2
        ids, score = hyps[0]
        assert ids[0] == 1  # GO
        assert score <= 0


def test_extract_segments_two_channel_sph(tmp_path):
    """Audio-domain extract-segments: slice a 2-channel conversation
    SPHERE by a Kaldi segments table with per-recording channel
    selection (the raw-LDC -> wav-mode step the reference delegates to
    Kaldi's extract-segments, train_all.sh:32-44)."""
    from ast_tpu.data.wav_loader import extract_segments

    rate = 8000
    n = 4 * rate  # 4 s conversation
    chan_a = (np.arange(n) % 1000).astype("<i2")
    chan_b = (-(np.arange(n) % 700)).astype("<i2")
    interleaved = np.empty(2 * n, dtype="<i2")
    interleaved[0::2] = chan_a
    interleaved[1::2] = chan_b

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_sph(str(audio_dir / "conv1.sph"), interleaved.tobytes(),
               channels=2, n_samples=n)

    seg = tmp_path / "segments"
    seg.write_text(
        "conv1-A-000 conv1 0.5 1.25\n"
        "conv1-A-001 conv1 2.0 3.5\n")
    cmap = tmp_path / "channels"
    cmap.write_text("conv1 0\n")

    out = tmp_path / "out"
    n_written = extract_segments(str(seg), str(audio_dir), str(out),
                                 channel_map=str(cmap), rate=rate)
    assert n_written == 2

    a = np.load(out / "conv1-A-000.npy")
    assert a.shape == (int(0.75 * rate),)
    want = chan_a[int(0.5 * rate):int(1.25 * rate)].astype(
        np.float32) / 32768.0
    np.testing.assert_allclose(a, want, atol=1e-6)

    b = np.load(out / "conv1-A-001.npy")
    assert b.shape == (int(1.5 * rate),)


def test_extract_segments_cli_and_missing(tmp_path):
    from ast_tpu.cli.prep_data import main as prep_main

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    x = np.sin(np.linspace(0, 30, 16000)).astype(np.float32)
    np.save(audio_dir / "reco1.npy", x)

    seg = tmp_path / "segments"
    seg.write_text("reco1-000 reco1 0.0 1.0\n"
                   "gone-000 gone 0.0 1.0\n")
    out = tmp_path / "out"

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        prep_main(["extract-segments", "--segments", str(seg),
                   "--audio_dir", str(audio_dir), "--out_dir", str(out)])

    prep_main(["extract-segments", "--segments", str(seg),
               "--audio_dir", str(audio_dir), "--out_dir", str(out),
               "--allow-missing"])
    got = np.load(out / "reco1-000.npy")
    np.testing.assert_allclose(got, x[:8000], atol=1e-7)


def test_extract_segments_stereo_wav_and_npy_channel_map(tmp_path):
    """The channel map applies to .wav and (T, channels) .npy
    recordings too — a mapped stereo wav must yield the selected
    channel, not a two-speaker average, and a stereo .npy must be
    channel-sliced, never flattened (which would interleave channels
    and halve every time offset)."""
    import wave
    from ast_tpu.data.wav_loader import extract_segments

    rate = 8000
    n = 2 * rate
    chan_a = (np.arange(n) % 1000).astype("<i2")
    chan_b = (-(np.arange(n) % 700)).astype("<i2")

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2] = chan_a
    inter[1::2] = chan_b
    with wave.open(str(audio_dir / "convw.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(inter.tobytes())
    np.save(audio_dir / "convn.npy",
            np.stack([chan_a, chan_b], axis=1).astype(np.float32)
            / 32768.0)

    seg = tmp_path / "segments"
    seg.write_text("convw-000 convw 0.25 1.0\n"
                   "convn-000 convn 0.25 1.0\n")
    cmap = {"convw": 1, "convn": 1}
    out = tmp_path / "out"
    assert extract_segments(str(seg), str(audio_dir), str(out),
                            channel_map=cmap, rate=rate) == 2

    want = chan_b[int(0.25 * rate):rate].astype(np.float32) / 32768.0
    np.testing.assert_allclose(np.load(out / "convw-000.npy"), want,
                               atol=1e-6)
    np.testing.assert_allclose(np.load(out / "convn-000.npy"), want,
                               atol=1e-6)


def test_extract_segments_rejects_rate_mismatch(tmp_path):
    """A recording whose header rate disagrees with --rate must error:
    slicing second-offsets at the wrong rate silently produces
    wrong-position, wrong-speed training audio (Kaldi reads the true
    file rate)."""
    import wave

    import pytest as _pytest

    from ast_tpu.data.wav_loader import extract_segments

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    x = (np.arange(16000) % 500).astype("<i2")
    with wave.open(str(audio_dir / "r16k.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())
    seg = tmp_path / "segments"
    seg.write_text("r16k-000 r16k 0.0 0.5\n")
    with _pytest.raises(ValueError, match="sample rate"):
        extract_segments(str(seg), str(audio_dir), str(tmp_path / "o"),
                         rate=8000)
