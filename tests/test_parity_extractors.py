"""Parity tests for the L1 feature extractors vs reference torch code.

Whisper encoder / HuBERT-soft / CREPE (real tiny checkpoint) / LSTM d-vector.
"""

import sys

import numpy as np
import pytest
import torch

import ref_stubs

ref_stubs.install()
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_vits_svc_tpu.models import convert  # noqa: E402


def _merge(model, init_args, params):
    init = model.init(*init_args)["params"]
    return convert.merge_into(init, params)


# ---------------------------------------------------------------- whisper


def test_whisper_logmel_parity(rng):
    from whisper_vits_svc_tpu.models.whisper import log_mel_spectrogram
    from whisper_vits_svc_tpu.ops.mel import mel_filterbank

    audio = (rng.standard_normal(16000 * 3) * 0.2).astype(np.float32)
    at = torch.from_numpy(audio)
    window = torch.hann_window(400)
    stft = torch.stft(at, 400, 160, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filterbank(16000, 400, 80))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    ref = ((log_spec + 4.0) / 4.0).numpy()  # [80, T]

    ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio)[None]))[0]  # [T, 80]
    np.testing.assert_allclose(ours.T, ref, rtol=1e-4, atol=1e-4)


def test_whisper_encoder_parity(rng):
    from whisper.model import AudioEncoder

    from whisper_vits_svc_tpu.models.whisper import WhisperEncoder, convert_encoder

    torch.manual_seed(0)
    ref = AudioEncoder(n_mels=80, n_ctx=64, n_state=64, n_head=4, n_layer=3).eval()
    mel = (rng.standard_normal((1, 80, 128)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(mel)).numpy()  # [1, 64, 64]

    ours = WhisperEncoder(n_mels=80, n_ctx=64, n_state=64, n_head=4, n_layer=3)
    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = convert_encoder(sd, n_layer=3)
    melx = mel.transpose(0, 2, 1)
    merged = _merge(ours, (jax.random.PRNGKey(0), melx), params)
    y = ours.apply({"params": merged}, melx)
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- hubert


def test_hubert_units_parity(rng):
    from hubert.hubert_model import HubertSoft as THubert

    from whisper_vits_svc_tpu.models.hubert import HubertSoft, convert_hubert

    torch.manual_seed(1)
    ref = THubert().eval()
    wav = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref_y = ref.units(torch.from_numpy(wav)[None, None]).numpy()

    ours = HubertSoft()
    params = convert_hubert(ref.state_dict())
    merged = _merge(ours, (jax.random.PRNGKey(0), jnp.asarray(wav)[None]), params)
    y = ours.apply({"params": merged}, jnp.asarray(wav)[None])
    assert y.shape == ref_y.shape
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- crepe


def test_crepe_tiny_checkpoint_parity(rng):
    """Real tiny.pth weights: our conv stack must match reference logits."""
    from crepe.model import Crepe as TCrepe

    from whisper_vits_svc_tpu.models.crepe import Crepe, convert_crepe, normalize_frames

    sd = torch.load("/root/reference/crepe/assets/tiny.pth", map_location="cpu",
                    weights_only=False)
    ref = TCrepe("tiny")
    ref.load_state_dict(sd)
    ref.eval()

    frames = rng.standard_normal((8, 1024)).astype(np.float32)
    frames = frames - frames.mean(axis=1, keepdims=True)
    frames = frames / np.maximum(frames.std(axis=1, keepdims=True), 1e-10)
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(frames)).numpy()

    ours = Crepe("tiny")
    params = convert_crepe(sd)
    merged = _merge(ours, (jax.random.PRNGKey(0), jnp.asarray(frames)), params)
    y = ours.apply({"params": merged}, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-3, atol=1e-4)


def test_crepe_framing_matches_reference(rng):
    import crepe as ref_crepe

    from whisper_vits_svc_tpu.models.crepe import frame_audio, normalize_frames

    audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    gen = ref_crepe.preprocess(torch.from_numpy(audio)[None], 16000, 160)
    ref_frames = next(gen).numpy()
    ours = np.asarray(normalize_frames(jnp.asarray(frame_audio(audio, 160))))
    assert ours.shape == ref_frames.shape
    np.testing.assert_allclose(ours, ref_frames, rtol=1e-4, atol=1e-5)


def test_viterbi_matches_bruteforce(rng):
    from whisper_vits_svc_tpu.models.crepe import PITCH_BINS, viterbi_decode

    T = 12
    probs = rng.random((T, PITCH_BINS)).astype(np.float64)
    probs /= probs.sum(axis=1, keepdims=True)
    path = viterbi_decode(probs)

    # verify against the librosa-semantics python DP from ref_stubs
    import librosa.sequence as seq

    from whisper_vits_svc_tpu.models.crepe import _transition_matrix

    expected = seq.viterbi(probs.T, _transition_matrix().astype(np.float64))
    np.testing.assert_array_equal(path, expected)


# ---------------------------------------------------------------- speaker


def test_speaker_encoder_parity(rng):
    from speaker.models.lstm import LSTMSpeakerEncoder as TLSTM

    from whisper_vits_svc_tpu.models.speaker_encoder import (
        LSTMSpeakerEncoder, convert_speaker_encoder,
    )

    torch.manual_seed(2)
    ref = TLSTM(80, 256, 768, 3).eval()
    mel = (rng.standard_normal((2, 60, 80)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(mel)).numpy()

    ours = LSTMSpeakerEncoder()
    params = convert_speaker_encoder(ref.state_dict())
    merged = _merge(ours, (jax.random.PRNGKey(0), jnp.asarray(mel)), params)
    y = ours.apply({"params": merged}, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-3, atol=1e-3)
