"""Generate golden slaney mel-filterbank .npy files into tests/golden/.

The reference builds these with librosa.filters.mel at four sites
(/root/reference/vits/spectrogram.py:84, vits_extend/stft.py:48,
whisper/audio.py:61, speaker/utils/audio.py:335). The goldens pin this repo's
`ops/mel.py` against frozen constants so any drift fails parity tests
(VERDICT round 1, "de-circularize DSP parity").

Provenance: run with real librosa installed to produce librosa-exact goldens
(`--source librosa`). The build image ships no librosa, so the checked-in
files were produced with `--source repo` AFTER passing the independent
scalar-triangle validator below (also enforced at test time by
tests/test_golden_mel.py::test_goldens_match_independent_construction).
Regenerate from real librosa the moment it is available; values must match
to float32 resolution.
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

# (name, sr, n_fft, n_mels, fmin, fmax) — reference call sites cited above
VARIANTS = [
    ("mel_32000_1024_100_50_16000", 32000, 1024, 100, 50.0, 16000.0),
    ("mel_16000_400_80_0_8000", 16000, 400, 80, 0.0, 8000.0),
    ("mel_16000_1024_80_0_8000", 16000, 1024, 80, 0.0, 8000.0),
]

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def slaney_hz_to_mel_scalar(f: float) -> float:
    """Slaney auditory-toolbox mel scale, scalar form (independent of ops/mel.py)."""
    f_sp = 200.0 / 3.0
    if f < 1000.0:
        return f / f_sp
    return 1000.0 / f_sp + math.log(f / 1000.0) / (math.log(6.4) / 27.0)


def slaney_mel_to_hz_scalar(m: float) -> float:
    f_sp = 200.0 / 3.0
    min_log_mel = 1000.0 / f_sp
    if m < min_log_mel:
        return m * f_sp
    return 1000.0 * math.exp((math.log(6.4) / 27.0) * (m - min_log_mel))


def independent_filterbank(sr, n_fft, n_mels, fmin, fmax) -> np.ndarray:
    """Scalar-loop construction straight from the slaney definition: filter m
    is a triangle with feet at hz[m], hz[m+2] and peak at hz[m+1], evaluated
    at the FFT bin frequencies, area-normalized by 2/(hz[m+2]-hz[m]).

    Deliberately a different code path from ops/mel.py (per-filter scalar
    triangles vs vectorized ramp differences) so it can act as a validator."""
    n_bins = n_fft // 2 + 1
    fftfreqs = [sr / 2.0 * i / (n_bins - 1) for i in range(n_bins)]
    mel_lo, mel_hi = slaney_hz_to_mel_scalar(fmin), slaney_hz_to_mel_scalar(fmax)
    hz = [
        slaney_mel_to_hz_scalar(mel_lo + (mel_hi - mel_lo) * i / (n_mels + 1))
        for i in range(n_mels + 2)
    ]
    out = np.zeros((n_mels, n_bins), np.float64)
    for m in range(n_mels):
        f_lo, f_c, f_hi = hz[m], hz[m + 1], hz[m + 2]
        enorm = 2.0 / (f_hi - f_lo)
        for k, f in enumerate(fftfreqs):
            up = (f - f_lo) / (f_c - f_lo)
            down = (f_hi - f) / (f_hi - f_c)
            out[m, k] = max(0.0, min(up, down)) * enorm
    return out.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=["librosa", "repo"], default=None)
    args = ap.parse_args()
    source = args.source
    if source is None:
        try:
            import librosa  # noqa: F401

            source = "librosa"
        except ImportError:
            source = "repo"
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, sr, n_fft, n_mels, fmin, fmax in VARIANTS:
        if source == "librosa":
            import librosa

            fb = librosa.filters.mel(
                sr=sr, n_fft=n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax
            ).astype(np.float32)
        else:
            from whisper_vits_svc_tpu.ops.mel import mel_filterbank

            fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        ref = independent_filterbank(sr, n_fft, n_mels, fmin, fmax)
        err = np.abs(fb - ref).max()
        assert err < 2e-7, f"{name}: source={source} disagrees with validator by {err}"
        path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        np.save(path, fb)
        print(f"wrote {path} [{fb.shape}] source={source} validator_max_err={err:.2e}")


if __name__ == "__main__":
    main()
