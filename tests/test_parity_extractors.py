"""Parity tests for the L1 feature extractors vs reference torch code.

Whisper encoder / HuBERT-soft / CREPE (real tiny checkpoint) / LSTM d-vector.
"""

import os
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


SILERO_JIT = "/root/reference/vad/assets/silero_vad.jit"


def _vowel_like(sr: int = 16000, seconds: float = 2.0) -> np.ndarray:
    """Pulse train at 120 Hz through 3 formant resonators with syllable-rate
    AM — speech-like enough to drive the real silero network."""
    from scipy.signal import lfilter

    t = np.arange(int(sr * seconds)) / sr
    x = np.zeros(len(t), np.float32)
    x[:: int(sr / 120.0)] = 1.0
    for fc, bw in [(500, 80), (1500, 120), (2500, 180)]:
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * fc / sr
        x = lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], x)
    x = x / np.abs(x).max() * 0.5
    return (x * (0.55 + 0.45 * np.sin(2 * np.pi * 2.5 * t))).astype(np.float32)


@pytest.mark.skipif(not os.path.isfile(SILERO_JIT), reason="silero blob absent")
def test_silero_vad_parity_vs_torchscript():
    """Real silero_vad.jit weights: our JAX network must match the blob's
    per-window speech probabilities (float32 accumulation + LSTM drift only)."""
    from whisper_vits_svc_tpu.models.silero_vad import (
        load_silero_vad, silero_speech_probs,
    )

    params = load_silero_vad(SILERO_JIT)
    m = torch.jit.load(SILERO_JIT, map_location="cpu")

    sr, W = 16000, 512
    audio = np.concatenate(
        [np.zeros(8000, np.float32), _vowel_like(sr), np.zeros(8000, np.float32)])

    m.reset_states()
    at = torch.from_numpy(audio)
    ref = []
    for s in range(0, len(audio), W):
        chunk = at[s : s + W]
        if len(chunk) < W:
            chunk = torch.nn.functional.pad(chunk, (0, W - len(chunk)))
        ref.append(m(chunk, sr).item())
    ref = np.asarray(ref)

    ours = silero_speech_probs(params, audio)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-2)
    # the decisions that drive the post-filter mask must agree exactly
    assert ((ref >= 0.2) == (ours >= 0.2)).all()
    # and the network separates speech from silence
    mid = ours[len(ours) // 3 : 2 * len(ours) // 3]
    assert np.median(mid) > 0.5 and ours[:8].max() < 0.2


@pytest.mark.skipif(not os.path.isfile(SILERO_JIT), reason="silero blob absent")
def test_vad_mask_with_silero_network():
    from whisper_vits_svc_tpu.infer.post import apply_vad_mask
    from whisper_vits_svc_tpu.models.silero_vad import load_silero_vad

    params = load_silero_vad(SILERO_JIT)
    sr = 16000
    audio = np.concatenate(
        [np.zeros(sr, np.float32), _vowel_like(sr, 1.0), np.zeros(sr, np.float32)])
    svc = np.ones(2 * len(audio), np.float32)
    out = apply_vad_mask(svc, audio, vad_params=params)
    # leading silence hard-muted (up to the 30 ms speech pad), speech kept
    assert out[: 2 * (sr - 960)].max() == 0.0
    assert out[2 * sr + 8000 : 4 * sr - 8000].min() == 1.0
