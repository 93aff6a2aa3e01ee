"""Tests for auxiliary components: alt F0 engines, crepe extras, MED, ResNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _sine(f0, sr=16000, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_yin_on_pure_tone():
    from whisper_vits_svc_tpu.models.f0_alt import yin

    for f_true in [110.0, 220.0, 440.0]:
        f0, conf = yin(_sine(f_true), fs=16000, hop=160)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        assert abs(np.median(voiced) - f_true) / f_true < 0.03, f_true


def test_pyin_on_tone_with_silence():
    from whisper_vits_svc_tpu.models.f0_alt import pyin

    audio = np.concatenate([_sine(220.0, seconds=0.5), np.zeros(8000, np.float32)])
    f0, vp = pyin(audio, fs=16000, hop=160, n_thresholds=30)
    T = len(f0)
    # voiced half tracks 220 Hz, silent half mostly unvoiced
    head = f0[: T // 3]
    head_voiced = head[head > 0]
    assert len(head_voiced) > 0.5 * len(head)
    assert abs(np.median(head_voiced) - 220.0) / 220.0 < 0.05
    tail = f0[2 * T // 3 :]
    assert np.mean(tail == 0) > 0.5


def test_swipe_on_harmonic_tones():
    from whisper_vits_svc_tpu.models.swipe import swipe

    sr = 16000
    t = np.arange(sr) / sr
    for f_true in [110.0, 220.0, 440.0]:
        x = sum(np.sin(2 * np.pi * f_true * h * t) / h for h in range(1, 8))
        f0, s = swipe((x * 0.2).astype(np.float32), sr)
        v = f0[f0 > 0]
        assert len(v) > 0.9 * len(f0)
        assert abs(np.median(v) - f_true) / f_true < 0.01
    f0_sil, _ = swipe(np.zeros(sr, np.float32), sr)
    assert (f0_sil == 0).all()


def test_crepe_threshold_and_decoders(rng):
    from whisper_vits_svc_tpu.models.crepe_extras import (
        At, Hysteresis, a_weighted_loudness, argmax_decode, weighted_argmax_decode,
    )

    pitch = rng.uniform(100, 400, 50)
    peri = rng.random(50)
    out = At(0.5)(pitch, peri)
    assert np.isnan(out[peri < 0.5]).all()
    assert (out[peri >= 0.5] == pitch[peri >= 0.5]).all()

    hyst = Hysteresis()(pitch, peri)
    assert hyst.shape == (1, 50)

    probs = rng.random((20, 360))
    bins, hz = argmax_decode(probs)
    assert (bins == probs.argmax(axis=1)).all() and (hz > 0).all()
    bins_w, hz_w = weighted_argmax_decode(probs)
    np.testing.assert_array_equal(bins_w, bins)
    # weighted estimate stays within the +-4 bin window of the argmax
    cents = 1200 * np.log2(hz_w / hz)
    assert np.abs(cents).max() <= 20 * 5

    loud = a_weighted_loudness(_sine(220.0), hop_length=160)
    assert loud.shape[0] == 1 and np.isfinite(loud).all()
    # loudness of a tone must exceed silence
    silent = a_weighted_loudness(np.zeros(16000, np.float32), hop_length=160)
    assert loud.mean() > silent.mean()


def test_med_discriminator_shapes(rng):
    from whisper_vits_svc_tpu.models.discriminator import MelspecDiscriminator

    x = jnp.asarray(rng.standard_normal((2, 48000, 1)), jnp.float32) * 0.2
    model = MelspecDiscriminator()
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert len(out) == 1
    fmap, score = out[0]
    assert len(fmap) == 4 and score.shape == (2,)
    assert np.isfinite(np.asarray(score)).all()


@pytest.mark.slow
def test_resnet_speaker_encoder(rng):
    from whisper_vits_svc_tpu.models.speaker_encoder import ResNetSpeakerEncoder

    mel = jnp.asarray(rng.standard_normal((2, 40, 64)), jnp.float32)
    model = ResNetSpeakerEncoder(layers=(1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0), mel)["params"]
    emb = model.apply({"params": params}, mel, l2_norm=True)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)


def test_htk_mel_filterbank():
    from whisper_vits_svc_tpu.ops.mel import mel_filterbank

    fb = mel_filterbank(48000, 2048, 128, htk=True, norm=None)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all() and fb.max() <= 1.0 + 1e-6


def test_salience_on_harmonic_tones():
    from whisper_vits_svc_tpu.models.salience import salience

    sr = 16000
    t = np.arange(sr) / sr
    for f_true in [110.0, 220.0, 440.0]:
        x = sum(np.sin(2 * np.pi * f_true * h * t) / h for h in range(1, 6))
        f0, sal = salience((x * 0.2).astype(np.float32), fs=sr, hop=160)
        assert abs(np.median(f0) - f_true) / f_true < 0.01, f_true
        assert np.median(sal) > 0.5


def test_salience_compute_f0_voicing_and_length():
    from whisper_vits_svc_tpu.models.salience import compute_f0_salience

    sr = 16000
    audio = np.concatenate([_sine(220.0, seconds=0.5), np.zeros(8000, np.float32)])
    f0 = compute_f0_salience(audio, fs=sr, hop=160)
    assert len(f0) == 1 + len(audio) // 160
    head = f0[: len(f0) // 3]
    assert abs(np.median(head[head > 0]) - 220.0) / 220.0 < 0.02
    tail = f0[2 * len(f0) // 3:]
    assert np.mean(tail == 0) > 0.5


def test_salience_sing_convention():
    from whisper_vits_svc_tpu.models.salience import compute_f0_sing_salience

    sr = 16000
    t = np.arange(sr) / sr
    x = sum(np.sin(2 * np.pi * 220.0 * h * t) / h for h in range(1, 6))
    f0 = compute_f0_sing_salience((x * 0.2).astype(np.float32), fs=sr)
    # hop 320 repeated x2 -> 160-hop frame count
    assert len(f0) == 2 * (1 + len(x) // 320)
    mid = f0[10:-10]
    assert abs(np.median(mid) - 220.0) / 220.0 < 0.01


def test_dio_stonemask_on_harmonic_tones():
    from whisper_vits_svc_tpu.models.dio import compute_f0_dio

    sr = 16000
    t = np.arange(sr) / sr
    for f_true in [110.0, 220.0, 440.0]:
        x = sum(np.sin(2 * np.pi * f_true * h * t) / h for h in range(1, 6))
        f0 = compute_f0_dio((x * 0.2).astype(np.float32), sr)
        v = f0[f0 > 0]
        assert len(v) > 0.9 * len(f0)
        assert abs(np.median(v) - f_true) / f_true < 0.01, f_true
    # tone + silence: unvoiced tail stays zero, length convention holds
    aud = np.concatenate(
        [0.3 * np.sin(2 * np.pi * 220 * t[:8000]), np.zeros(8000)]).astype(np.float32)
    f0 = compute_f0_dio(aud, sr)
    assert len(f0) == 1 + len(aud) // 160
    assert np.mean(f0[60:] == 0) > 0.9


def test_praat_ac_on_harmonic_tones():
    from whisper_vits_svc_tpu.models.praat import compute_f0_mouth, to_pitch_ac

    sr = 16000
    t = np.arange(sr) / sr
    for f_true in [110.0, 220.0, 440.0]:
        x = sum(np.sin(2 * np.pi * f_true * h * t) / h for h in range(1, 6))
        f0 = to_pitch_ac((x * 0.2).astype(np.float32), sr)
        v = f0[f0 > 0]
        assert len(v) == len(f0)
        assert abs(np.median(v) - f_true) / f_true < 0.005, f_true
    aud = np.concatenate(
        [0.3 * np.sin(2 * np.pi * 220 * t[:8000]), np.zeros(8000)]).astype(np.float32)
    f0 = compute_f0_mouth(aud, sr)
    assert len(f0) == 1 + len(aud) // 160
    # reference pads 1024//160 = 6 zero frames each side (pitch/inference.py:21-27)
    assert (f0[:6] == 0).all()
    assert np.mean(f0[70:] == 0) > 0.9


def test_enable_compile_cache(tmp_path, monkeypatch):
    """CLI compile-cache helper: honors SVC_XLA_CACHE, creates the dir, sets
    jax's persistent-cache config; empty value disables."""
    import jax

    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        d = str(tmp_path / "xc")
        monkeypatch.setenv("SVC_XLA_CACHE", d)
        assert enable_compile_cache() == d
        assert jax.config.jax_compilation_cache_dir == d
        import os
        assert os.path.isdir(d)
        monkeypatch.setenv("SVC_XLA_CACHE", "")
        assert enable_compile_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        # restore the conftest's threshold too — leaving the helper's 2.0 s
        # would make later tests' cache behavior order-dependent (ADVICE r3)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
