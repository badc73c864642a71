"""Generate the committed shorten-SPHERE golden fixtures.

Writes tests/fixtures/shorten/:
  fisher_like.sph           2-ch mu-law embedded-shorten-v2 SPHERE
                            (the coding real LDC Fisher tapes use:
                            reference fsp_data_prep.sh:37-41)
  fisher_like_expected.npy  (n, 2) float32 — its exact PCM rendering
  pcm_like.sph              2-ch big-endian PCM embedded-shorten SPHERE
  pcm_like_expected.npy     (n, 2) float32
  raw_s16.shn               bare shorten stream (wav-style, with a RIFF
                            verbatim header) for the libavcodec
                            cross-check in tests/test_shorten.py
  raw_s16_expected.npy      (n, 2) int16 samples for it

The audio is synthetic speech-like (sum of slow sines + noise bursts)
so the Rice/predictor machinery sees realistic statistics.  Fixtures
are deterministic (fixed seed) and regenerable with:

    python scripts/make_shorten_fixtures.py
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ast_tpu.data import shorten as sh  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "shorten")


def speechlike(n, seed, scale=6000.0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    x = (scale * np.sin(t / 23.0) * (0.4 + 0.6 * np.sin(t / 311.0) ** 2)
         + scale * 0.2 * np.sin(t / 7.3)
         + rng.randn(n) * scale * 0.03)
    # silence gaps like a telephone turn-taking channel
    gate = (np.sin(t / 801.0) > -0.3).astype(np.float64)
    return np.round(x * gate).astype(np.int64)


def sphere_header(fields):
    body = "".join(f"{k} {t} {v}\n" for k, (t, v) in fields.items())
    blob = "NIST_1A\n   1024\n" + body + "end_head\n"
    return blob.encode("ascii").ljust(1024, b" ")


def wav_header(n, nchan, rate=8000, bits=16):
    ba = nchan * bits // 8
    ds = n * ba
    return (b"RIFF" + struct.pack("<I", 36 + ds) + b"WAVE"
            b"fmt " + struct.pack("<IHHIIHH", 16, 1, nchan, rate,
                                  rate * ba, ba, bits)
            + b"data" + struct.pack("<I", ds))


def main():
    os.makedirs(OUT, exist_ok=True)
    n = 6000

    # ---- mu-law 2-channel embedded-shorten (Fisher-like) ----
    a = np.clip(speechlike(n, 0), -30000, 30000)
    b = np.clip(speechlike(n, 1, scale=3000.0), -30000, 30000)
    pcm = np.stack([a, b], axis=1)
    # project onto the ulaw grid: code bytes, then their exact linear
    codes = np.stack([_lin_to_ulaw(a), _lin_to_ulaw(b)], axis=1)
    internal = sh._SIGNMAG_IN[codes]          # AU1 internal domain
    data = sh.encode(internal, sh.TYPE_AU1, blocksize=256, nmean=4)
    hdr = sphere_header({
        "database_id": ("-s8", "syn_test"),
        "channel_count": ("-i", 2),
        "sample_count": ("-i", n),
        "sample_rate": ("-i", 8000),
        "sample_n_bytes": ("-i", 1),
        "sample_byte_format": ("-s1", "1"),
        "sample_coding": ("-s26", "ulaw,embedded-shorten-v2"),
    })
    with open(os.path.join(OUT, "fisher_like.sph"), "wb") as f:
        f.write(hdr + data)
    lin = sh._ULAW_EXPAND[codes].astype(np.float32) / 32768.0
    np.save(os.path.join(OUT, "fisher_like_expected.npy"),
            lin.astype(np.float32))

    # ---- pcm 2-channel big-endian embedded-shorten ----
    data = sh.encode(pcm, sh.TYPE_S16HL, blocksize=256, nmean=4,
                     use_qlpc=True)
    hdr = sphere_header({
        "channel_count": ("-i", 2),
        "sample_count": ("-i", n),
        "sample_rate": ("-i", 8000),
        "sample_n_bytes": ("-i", 2),
        "sample_byte_format": ("-s2", "10"),
        "sample_coding": ("-s25", "pcm,embedded-shorten-v2"),
    })
    with open(os.path.join(OUT, "pcm_like.sph"), "wb") as f:
        f.write(hdr + data)
    np.save(os.path.join(OUT, "pcm_like_expected.npy"),
            (pcm / 32768.0).astype(np.float32))

    # ---- bare .shn with RIFF verbatim (libavcodec cross-check) ----
    data = sh.encode(pcm, sh.TYPE_S16LH, blocksize=256, nmean=4,
                     verbatim=wav_header(n, 2))
    with open(os.path.join(OUT, "raw_s16.shn"), "wb") as f:
        f.write(data)
    np.save(os.path.join(OUT, "raw_s16_expected.npy"),
            pcm.astype(np.int16))
    print("wrote fixtures to", OUT)


def _lin_to_ulaw(x):
    """Exact-nearest G.711 mu-law code for linear samples."""
    return sh._nearest_code(np.asarray(x, np.int64), sh._ULAW_EXPAND)


if __name__ == "__main__":
    main()
