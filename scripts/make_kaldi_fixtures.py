"""Generate golden Kaldi-MFCC/CMVN fixtures for tests/fixtures/.

This is an INDEPENDENT re-implementation of Kaldi's ``compute-mfcc-feats``
pipeline (reference conf: linking_files/fisher/mfcc.conf — 8 kHz,
--use-energy=false, --num-ceps=13; remaining knobs are Kaldi defaults:
25 ms frame / 10 ms shift, povey window, preemph 0.97, remove-dc-offset,
round-to-power-of-two, 23 mel bins on [20 Hz, Nyquist], cepstral-lifter
22, snip-edges, dither disabled for determinism), written per-frame the
way Kaldi's feature-window code works, with ``np.fft.rfft`` — deliberately
sharing no code with ``ast_tpu.ops.fbank`` (whole-utterance matmul-DFT).
The committed .npz is the oracle ``tests/test_features.py`` validates the
on-device extractor against.

Run from the repo root:  python scripts/make_kaldi_fixtures.py
"""

import os

import numpy as np

SAMPLE_RATE = 8000
FRAME_LEN = 200          # 25 ms
FRAME_SHIFT = 80         # 10 ms
PADDED_LEN = 256         # round to power of two
NUM_MEL = 23
NUM_CEPS = 13
LOW_FREQ = 20.0
HIGH_FREQ = SAMPLE_RATE / 2.0
PREEMPH = 0.97
LIFTER = 22.0
FLT_EPSILON = float(np.finfo(np.float32).eps)


def mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks():
    """(NUM_MEL, PADDED_LEN//2) triangular weights, Kaldi mel-computations
    semantics: bins span fft bins 0..padded/2-1 (nyquist excluded)."""
    n_fft_bins = PADDED_LEN // 2
    fft_bin_width = SAMPLE_RATE / PADDED_LEN
    mel_low, mel_high = mel(LOW_FREQ), mel(HIGH_FREQ)
    mel_delta = (mel_high - mel_low) / (NUM_MEL + 1)
    banks = np.zeros((NUM_MEL, n_fft_bins))
    for b in range(NUM_MEL):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        for i in range(n_fft_bins):
            m = mel(fft_bin_width * i)
            if left < m < right:
                if m <= center:
                    banks[b, i] = (m - left) / (center - left)
                else:
                    banks[b, i] = (right - m) / (right - center)
    return banks


def povey_window():
    i = np.arange(FRAME_LEN)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (FRAME_LEN - 1))) ** 0.85


def dct_matrix():
    """(NUM_CEPS, NUM_MEL) Kaldi ComputeDctMatrix rows."""
    m = np.zeros((NUM_CEPS, NUM_MEL))
    m[0, :] = np.sqrt(1.0 / NUM_MEL)
    for k in range(1, NUM_CEPS):
        m[k, :] = np.sqrt(2.0 / NUM_MEL) * np.cos(
            np.pi * k * (np.arange(NUM_MEL) + 0.5) / NUM_MEL)
    return m


def lifter_coeffs():
    k = np.arange(NUM_CEPS)
    return 1.0 + 0.5 * LIFTER * np.sin(np.pi * k / LIFTER)


def kaldi_mfcc(wave):
    """Per-frame Kaldi pipeline: dc-offset -> preemph -> povey -> rfft
    power -> mel (floored at FLT_EPSILON) -> log -> DCT -> lifter."""
    wave = np.asarray(wave, np.float64)
    n_frames = 1 + (len(wave) - FRAME_LEN) // FRAME_SHIFT
    window = povey_window()
    banks = mel_banks()
    dct = dct_matrix()
    lift = lifter_coeffs()
    out = np.zeros((n_frames, NUM_CEPS))
    for t in range(n_frames):
        frame = wave[t * FRAME_SHIFT: t * FRAME_SHIFT + FRAME_LEN].copy()
        frame -= frame.mean()
        # Kaldi preemphasizes in reverse order, x[0] against itself
        frame[1:] -= PREEMPH * frame[:-1]
        frame[0] -= PREEMPH * frame[0]
        frame *= window
        padded = np.zeros(PADDED_LEN)
        padded[:FRAME_LEN] = frame
        power = np.abs(np.fft.rfft(padded)) ** 2
        mel_e = banks @ power[: PADDED_LEN // 2]
        log_mel = np.log(np.maximum(mel_e, FLT_EPSILON))
        out[t] = (dct @ log_mel) * lift
    return out


def cmvn_normalize(mats):
    """Kaldi compute-cmvn-stats + apply-cmvn --norm-vars=true over a
    speaker's utterances (float64 sum/sumsq accumulators)."""
    total = np.zeros(NUM_CEPS)
    total_sq = np.zeros(NUM_CEPS)
    count = 0
    for m in mats:
        total += m.sum(axis=0)
        total_sq += (m * m).sum(axis=0)
        count += m.shape[0]
    mean = total / count
    var = total_sq / count - mean ** 2
    scale = 1.0 / np.sqrt(np.maximum(var, 1e-20))
    return [(m - mean) * scale for m in mats], mean, np.sqrt(var)


def make_signals():
    """Synthetic 8 kHz test signals at int16 scale (Kaldi reads PCM
    without normalizing)."""
    rng = np.random.RandomState(20260816)
    t1 = np.arange(4000) / SAMPLE_RATE
    tones = (3000.0 * np.sin(2 * np.pi * 313.0 * t1)
             + 1500.0 * np.sin(2 * np.pi * 1170.0 * t1 + 0.7)
             + 700.0 * np.sin(2 * np.pi * 2905.0 * t1 + 1.9))
    noise = rng.randn(8000) * 2500.0
    t3 = np.arange(3210) / SAMPLE_RATE
    am = (1.0 + 0.8 * np.sin(2 * np.pi * 3.0 * t3))
    chirp = 4000.0 * am * np.sin(2 * np.pi * (200.0 + 800.0 * t3) * t3)
    silence_then_tone = np.zeros(2400)
    silence_then_tone[1200:] = 2000.0 * np.sin(
        2 * np.pi * 440.0 * np.arange(1200) / SAMPLE_RATE)
    return {
        "tones": tones, "noise": noise, "chirp": chirp,
        "silence_then_tone": silence_then_tone,
    }


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.path.join(here, "..", "tests", "fixtures",
                            "kaldi_mfcc.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    signals = make_signals()
    blob = {}
    mfccs = {}
    for name, wave in signals.items():
        feats = kaldi_mfcc(wave)
        mfccs[name] = feats
        blob[f"audio_{name}"] = wave.astype(np.float32)
        blob[f"mfcc_{name}"] = feats.astype(np.float32)

    # one "speaker" owning tones+noise: CMVN golden output
    normed, mean, std = cmvn_normalize([mfccs["tones"], mfccs["noise"]])
    blob["cmvn_mean"] = mean.astype(np.float32)
    blob["cmvn_std"] = std.astype(np.float32)
    blob["cmvn_tones"] = normed[0].astype(np.float32)
    blob["cmvn_noise"] = normed[1].astype(np.float32)

    np.savez_compressed(out_path, **blob)
    print(f"wrote {os.path.normpath(out_path)}: "
          + ", ".join(f"{k}{v.shape}" for k, v in sorted(blob.items())))


if __name__ == "__main__":
    main()
