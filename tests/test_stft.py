"""Parity tests: matmul-STFT vs torch.stft for all four reference conventions.

The reference routes all spectrograms through torch.stft; these tests pin our
MXU-friendly framed-matmul formulation to the same numerics (float32, rtol
dominated by accumulation order differences).
"""

import numpy as np
import pytest
import torch

from whisper_vits_svc_tpu.ops import stft as jstft
from whisper_vits_svc_tpu.ops.mel import mel_filterbank


def _torch_vits_linear(y, n_fft, hop, win):
    # reference vits/spectrogram.py:41-76
    yt = torch.from_numpy(y)
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=False,
    )
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6).numpy()  # [B, F, T]


def _torch_stft_loss_mag(y, n_fft, hop, win):
    # reference vits_extend/stft_loss.py:12-29
    yt = torch.from_numpy(y)
    s = torch.stft(yt, n_fft, hop, win, torch.hann_window(win), return_complex=False)
    real, imag = s[..., 0], s[..., 1]
    return torch.sqrt(torch.clamp(real**2 + imag**2, min=1e-7)).transpose(2, 1).numpy()


def _torch_mrd_mag(y, n_fft, hop, win):
    # reference vits_decoder/mrd.py:39-46
    yt = torch.from_numpy(y)
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt, (pad, pad), mode="reflect")
    s = torch.stft(yt, n_fft=n_fft, hop_length=hop, win_length=win, center=False,
                   return_complex=False)
    return torch.norm(s, p=2, dim=-1).numpy()  # [B, F, T]


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 320, 1024), (512, 160, 512)])
def test_linear_spectrogram_parity(rng, n_fft, hop, win):
    y = (rng.standard_normal((2, 32000)) * 0.4).astype(np.float32)
    ours = np.asarray(jstft.linear_spectrogram(y, n_fft, hop, win))  # [B,T,F]
    ref = _torch_vits_linear(y, n_fft, hop, win)  # [B,F,T]
    assert ours.shape == (ref.shape[0], ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 120, 600), (2048, 240, 1200),
                                           (512, 50, 240)])
def test_stft_loss_magnitude_parity(rng, n_fft, hop, win):
    y = (rng.standard_normal((2, 8000)) * 0.4).astype(np.float32)
    ours = np.asarray(jstft.stft_loss_magnitude(y, n_fft, hop, win))  # [B,T,F]
    ref = _torch_stft_loss_mag(y, n_fft, hop, win)  # [B,T,F] (already transposed)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 120, 600), (512, 50, 240)])
def test_mrd_magnitude_parity(rng, n_fft, hop, win):
    y = (rng.standard_normal((2, 8000)) * 0.4).astype(np.float32)
    ours = np.asarray(jstft.mrd_magnitude(y, n_fft, hop, win))  # [B,T,F]
    ref = _torch_mrd_mag(y, n_fft, hop, win)  # [B,F,T]
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-3)


def test_mel_spectrogram_matches_manual_torch(rng):
    # TacotronSTFT.mel_spectrogram equivalent (vits_extend/stft.py:76-110)
    n_fft, hop, win, sr, n_mels, fmin, fmax = 1024, 320, 1024, 32000, 100, 50.0, 16000.0
    y = (rng.standard_normal((2, 32000)) * 0.3).astype(np.float32)

    yt = torch.from_numpy(y)
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    s = torch.stft(yt, n_fft, hop_length=hop, win_length=win,
                   window=torch.hann_window(win), center=False, pad_mode="reflect",
                   normalized=False, onesided=True, return_complex=False)
    mag = torch.sqrt(s.pow(2).sum(-1) + 1e-9)
    mel_w = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    ref = torch.log(torch.clamp(torch.matmul(mel_w, mag), min=1e-5)).numpy()  # [B,M,T]

    ours = np.asarray(
        jstft.mel_spectrogram(y, n_fft, n_mels, sr, hop, win, fmin, fmax)
    )  # [B,T,M]
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(32000, 1024, 100, 50.0, 16000.0)
    assert fb.shape == (100, 513)
    assert (fb >= 0).all()
    # every filter is non-empty and unimodal-ish (triangular)
    assert (fb.sum(axis=1) > 0).all()
    # filters cover the band without large gaps
    coverage = fb.sum(axis=0)
    lo = int(50.0 / (16000.0 / 512)) + 2
    hi = int(16000.0 / (16000.0 / 512)) - 2
    assert (coverage[lo:hi] > 0).all()


def test_stft_complex_parity_vs_torch(rng):
    # librosa convention used by the salience engine (pitch/core/salience.py:132):
    # center=True, constant pad, win_length == n_fft
    n_fft, hop = 512, 160
    y = (rng.standard_normal((1, 8000)) * 0.4).astype(np.float32)
    re, im = jstft.stft_complex(y, n_fft, hop, n_fft, center=True, pad_mode="constant")
    yt = torch.nn.functional.pad(torch.from_numpy(y), (n_fft // 2, n_fft // 2))
    s = torch.stft(yt, n_fft, hop, n_fft, torch.hann_window(n_fft), center=False,
                   return_complex=True)
    np.testing.assert_allclose(np.asarray(re)[0].T, s[0].real.numpy(), rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im)[0].T, s[0].imag.numpy(), rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("fl,hop,L", [
    (1024, 120, 8000), (512, 50, 8000), (4096, 480, 9000),
    (1024, 320, 8640), (400, 160, 5007),
])
def test_frame_signal_custom_vjp_matches_native(fl, hop, L):
    """The overlap-add adjoint (custom VJP) == XLA's native patch-extraction
    VJP, including partial trailing frames and leftover samples."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(fl + hop)
    x = jnp.asarray(rng.standard_normal((2, L)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((2, 1 + (L - fl) // hop, fl)), jnp.float32)

    def loss_custom(x):
        return jnp.sum(w * jstft.frame_signal(x, fl, hop))

    def loss_native(x):
        lead = x.shape[:-1]
        p = jax.lax.conv_general_dilated_patches(
            x.reshape(-1, x.shape[-1])[:, :, None], filter_shape=(fl,),
            window_strides=(hop,), padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return jnp.sum(w * p.reshape(lead + p.shape[1:]))

    g1 = jax.grad(loss_custom)(x)
    g2 = jax.grad(loss_native)(x)
    np.testing.assert_allclose(g1, g2, atol=1e-5, rtol=1e-5)
