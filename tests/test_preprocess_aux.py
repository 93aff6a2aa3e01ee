"""Aux preprocessing stages: iSTFT, CDC (DC-cut), silence trim.

Pins our matmul-iSTFT to torch.istft and the CDC stage to the reference's
torch formulation (prepare/preprocess_cdc.py:17-28); the silence trim
(prepare/preprocess_trim.py:12-25, pydub semantics) is checked behaviorally.
"""

import numpy as np
import pytest
import torch

from whisper_vits_svc_tpu.data.preprocess import (
    _quantize_int16_trunc,
    cut_direct_content,
    detect_silence_ms,
    trim_silence_concat,
)
from whisper_vits_svc_tpu.ops.stft import istft, stft_complex


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (512, 128, 512)])
def test_istft_matches_torch(rng, n_fft, hop, win):
    y = rng.standard_normal((2, 8000)).astype(np.float32) * 0.3
    yt = torch.from_numpy(y)
    spec = torch.stft(yt, n_fft, hop, win, torch.hann_window(win),
                      return_complex=True)
    ref = torch.istft(spec, n_fft, hop, win, torch.hann_window(win),
                      length=y.shape[-1]).numpy()

    re, im = stft_complex(y, n_fft, hop, win, center=True, pad_mode="reflect")
    out = np.asarray(istft(re, im, n_fft, hop, win, center=True,
                           length=y.shape[-1]))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_istft_roundtrip_identity(rng):
    y = rng.standard_normal((1, 5000)).astype(np.float32)
    re, im = stft_complex(y, 1024, 256, 1024, center=True, pad_mode="reflect")
    out = np.asarray(istft(re, im, 1024, 256, 1024, length=5000))
    # envelope-normalized OLA reconstructs exactly wherever frames exist
    np.testing.assert_allclose(out, y, atol=2e-5)


def test_cdc_matches_reference_torch(rng):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    # strong DC offset + low-frequency hum + voice-band tone
    y = (0.3 + 0.2 * np.sin(2 * np.pi * 20 * t)
         + 0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    ours = _quantize_int16_trunc(cut_direct_content(y))

    # the reference formulation (prepare/preprocess_cdc.py:17-28)
    src = torch.from_numpy(y)[None]
    spec = torch.stft(src, 1024, 256, 1024, torch.hann_window(1024),
                      return_complex=True)
    spec[:, 0, :] = 0
    spec[:, 1, :] = 0
    ref = torch.istft(spec, 1024, 256, 1024, torch.hann_window(1024)).squeeze()
    ref = (32768.0 * ref).clamp(min=-32768, max=32767).short().numpy()

    n = min(len(ours), len(ref))
    # int16 after float math: allow 1 LSB of rounding skew on a tiny fraction
    diff = np.abs(ours[:n].astype(np.int32) - ref[:n].astype(np.int32))
    assert np.mean(diff <= 1) > 0.999 and diff.max() <= 2

    # the point of CDC: DC is gone
    assert abs(np.mean(ours / 32768.0)) < 1e-3 and abs(np.mean(y)) > 0.25


def test_trim_silence_drops_internal_gap():
    sr = 16000
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    gap = np.zeros(sr, np.float32)  # 1 s of silence (>> 200 ms)
    y = np.concatenate([tone, gap, tone])

    sil = detect_silence_ms(y, sr)
    assert len(sil) == 1
    s, e = sil[0]
    assert 950 <= s <= 1050 and 1950 <= e <= 2050

    out = trim_silence_concat(y, sr)
    # 1 s silence collapsed to ~2x200 ms keep_silence margins
    assert 2.3 * sr < len(out) < 2.6 * sr
    # speech untouched (the first chunk includes its 200 ms margin)
    assert np.allclose(out[:sr], tone)


def test_trim_silence_no_silence_is_identity():
    sr = 16000
    y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)).astype(np.float32)
    out = trim_silence_concat(y, sr)
    np.testing.assert_array_equal(out, y)


def test_trim_all_silence_returns_input():
    sr = 16000
    y = np.zeros(sr, np.float32)
    out = trim_silence_concat(y, sr)
    assert len(out) == len(y)
