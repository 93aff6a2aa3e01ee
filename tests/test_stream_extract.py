"""Streaming feature extractors vs their offline counterparts
(VERDICT r4 next #1 — the audio-in half of the streaming story).

Equivalence claims, each pinned here at its stated tolerance:
  * CREPE probabilities/framing are blockwise-EXACT; the fixed-lag decode
    equals the offline full viterbi whenever the remaining lag covers the
    horizon (exactly at flush); mid-stream the emitted pitch agrees with the
    offline path on real (harmonic) signals except isolated frames.
  * HuBERT streaming is EXACT vs offline while the stream fits the carried
    window (both reduce to the same masked natural-length run), and exactly
    equals the [context | block] windowed run afterwards (the documented
    receptive-field approximation).
  * Whisper streaming recomputes a sliding 15 s window; its frame
    bookkeeping is pinned against direct window runs.

Uses the REAL crepe tiny.pth checkpoint (the one extractor whose pretrained
blob ships in the reference snapshot).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_vits_svc_tpu.infer import stream_extract as se
from whisper_vits_svc_tpu.models import crepe as crepe_mod
from whisper_vits_svc_tpu.models import hubert as hubert_mod
from whisper_vits_svc_tpu.models import whisper as whisper_mod

CREPE_TINY = "/root/reference/crepe/assets/tiny.pth"


@pytest.fixture(scope="module")
def crepe_tiny():
    return crepe_mod.load_crepe(CREPE_TINY, "tiny")


def _sine(seconds, f0=220.0, sr=16000, glide=0.0, seed=0):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    f = f0 * (1.0 + glide * t / max(seconds, 1e-9))
    phase = 2 * np.pi * np.cumsum(f) / sr
    rng = np.random.default_rng(seed)
    x = 0.5 * np.sin(phase) + 0.15 * np.sin(2 * phase)
    return (x + rng.standard_normal(n) * 0.005).astype(np.float32)


# ------------------------------------------------------------------- crepe


def test_stream_crepe_flush_equals_offline_viterbi(crepe_tiny):
    """Single push + finish: the online trellis with full backtrace must
    reproduce the offline whole-utterance viterbi EXACTLY (same obs, same
    transition, same init)."""
    m, p = crepe_tiny
    audio = _sine(1.28)  # 20480 samples = 64 frames + boundary frame
    pitch_off, _ = crepe_mod.predict(m, p, audio, hop_length=320,
                                     batch_size=64, dither_rng=None)

    sc = se.StreamingCrepe(m, p)
    sc.push(audio)
    sc.finish()
    path = sc.decode(0, sc.head + 1)
    hz = crepe_mod.cents_to_frequency(
        crepe_mod.bins_to_cents(path)).astype(np.float32)
    assert len(hz) == len(pitch_off)
    np.testing.assert_allclose(hz, pitch_off, rtol=1e-6)


def test_stream_crepe_blockwise_probs_exact(crepe_tiny):
    """Blockwise pushes must produce the SAME trellis as one big push —
    framing is local and the emitted support is complete."""
    m, p = crepe_tiny
    audio = _sine(2.0, glide=0.3)
    one = se.StreamingCrepe(m, p)
    one.push(audio)
    one.finish()

    blocks = se.StreamingCrepe(m, p)
    for s in range(0, len(audio), 8000):
        blocks.push(audio[s : s + 8000])
    blocks.finish()

    assert one.head == blocks.head
    np.testing.assert_allclose(one.value, blocks.value, rtol=1e-6)
    np.testing.assert_array_equal(one.decode(0, one.head + 1),
                                  blocks.decode(0, blocks.head + 1))


# ------------------------------------------------------------------ hubert


def _small_hubert():
    model = hubert_mod.HubertSoft(n_layers=2)
    wav0 = jnp.zeros((1, 48000))
    params = model.init(jax.random.PRNGKey(0), wav0)["params"]
    return model, params


def test_stream_hubert_emission_exact_vs_offline_prefix(rng):
    """The precise streaming-hubert semantics: frames emitted at push k are
    EXACT vs the offline pred_vec run on the audio available at that moment
    (while the stream fits [context+block], both are the same masked
    natural-length run — the only difference from full-offline is the future
    audio the stream has not seen yet)."""
    model, params = _small_hubert()
    audio = (rng.standard_normal(48000) * 0.2).astype(np.float32)  # 3 s

    sh = se.StreamingHubert(model, params, block_samples=16000,
                            context_seconds=2.0)
    emitted = 0
    for s in range(0, len(audio), 16000):
        sh.push(audio[s : s + 16000])
        n_avail = sh.total // se.HOP
        got = sh.frames(emitted, n_avail)
        off_prefix = hubert_mod.pred_vec(model, params, audio[: s + 16000],
                                         window_seconds=20)
        np.testing.assert_allclose(got, off_prefix[emitted:n_avail],
                                   rtol=1e-4, atol=1e-5)
        emitted = n_avail

    # at end-of-stream the final window saw ALL audio: every frame matches
    # the full offline run exactly
    off = hubert_mod.pred_vec(model, params, audio, window_seconds=20)
    np.testing.assert_allclose(sh.frames(0, 150), off[:150],
                               rtol=1e-4, atol=1e-5)


def test_stream_hubert_windowed_run_self_consistent(rng):
    """Past the carried window, emitted frames must equal a direct
    [context | block] windowed run at the right global offsets (the frame
    bookkeeping under the rolling buffer)."""
    model, params = _small_hubert()
    blocks = [(rng.standard_normal(16000) * 0.2).astype(np.float32)
              for _ in range(5)]  # 5 s total > 3 s window
    sh = se.StreamingHubert(model, params, block_samples=16000,
                            context_seconds=2.0)
    for b in blocks:
        sh.push(b)
    # after 5 pushes the window holds blocks 2..4 (last 48000 samples)
    lo, hi = sh.total // se.HOP - 50, sh.total // se.HOP - 4
    got = sh.frames(lo, hi)
    window = np.concatenate(blocks)[-48000:]
    direct = hubert_mod.vec_window_batch(
        model, params, window[None], np.asarray([48000]))[0]
    s0 = (sh.total - 48000) // se.HOP
    np.testing.assert_allclose(got, direct[lo - s0 : hi - s0],
                               rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------------- whisper


def _small_whisper():
    model = whisper_mod.WhisperEncoder(n_mels=80, n_ctx=1500, n_state=64,
                                       n_head=4, n_layer=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1500, 80)))["params"]
    return model, params


@pytest.mark.slow
def test_stream_whisper_sliding_window_bookkeeping(rng):
    """Emitted frames must equal a direct masked-window run on the exact
    window content at the right global offsets — warmup (left-placed,
    masked) AND steady-state (rolling 15 s)."""
    model, params = _small_whisper()
    W = whisper_mod.WINDOW_SAMPLES
    audio = (rng.standard_normal(W + 2 * 16000) * 0.2).astype(np.float32)
    sw = se.StreamingWhisper(model, params)

    # warmup: 2 pushes -> window is the 2 s prefix, masked
    for s in range(0, 32000, 16000):
        sw.push(audio[s : s + 16000])
    direct = whisper_mod.ppg_window_batch(
        model, params,
        np.pad(audio[:32000], (0, W - 32000))[None],
        np.asarray([32000]), rng=None)[0]
    np.testing.assert_allclose(sw.frames(0, 100), direct[:100],
                               rtol=1e-5, atol=1e-5)

    # steady state: push through the full window + 2 more blocks
    for s in range(32000, len(audio), 16000):
        sw.push(audio[s : s + 16000])
    n = sw.total // se.HOP
    direct = whisper_mod.ppg_window_batch(
        model, params, audio[-W:][None], np.asarray([W]), rng=None)[0]
    got = sw.frames(n - 54, n - 4)
    np.testing.assert_allclose(got, direct[750 - 54 : 750 - 4],
                               rtol=1e-5, atol=1e-5)

    # at a 15 s-aligned position the window content equals the offline
    # disjoint window exactly (the aligned-exactness claim in STREAMING.md):
    # here total = W + 32000, so the window [32000 : W+32000] is exactly
    # what an offline walk restarted at 32000 would use — checked above via
    # the direct run; bookkeeping maps it to global frames [100, 100+750).
    assert sw._start_frame == 100


# ---------------------------------------------------------------- composed


def test_stream_extractor_composed_pitch_matches_offline(crepe_tiny, rng):
    """Composed blockwise emission vs offline compute_f0_sing (rng=None):
    the emitted 100 fps pitch matches the offline pipeline except where the
    fixed-lag decode picks a different (isolated) path frame. Tolerances:
    >= 97% of frames exact to 1e-4 rel; every frame within 6% rel (one
    pitch bin is ~1.2%)."""
    m, p = crepe_tiny
    model_w, params_w = _small_whisper()
    model_h, params_h = _small_hubert()
    audio = _sine(4.0, glide=0.25, seed=3)  # 64000 samples, 4 blocks

    off = crepe_mod.compute_f0_sing(m, p, audio, rng=None)

    ex = se.StreamingExtractor(
        whisper=(model_w, params_w), hubert=(model_h, params_h),
        crepe=(m, p), block_samples=16000)
    pits, ppgs, vecs = [], [], []
    for s in range(0, len(audio), 16000):
        ppg2, vec2, pit = ex.push(audio[s : s + 16000])
        pits.append(pit)
        ppgs.append(ppg2)
        vecs.append(vec2)
    ppg2, vec2, pit = ex.flush()
    pits.append(pit)
    ppgs.append(ppg2)
    vecs.append(vec2)
    got = np.concatenate(pits)
    n = len(audio) // se.HOP  # 200 -> 400 emitted 100fps frames
    assert len(got) == 2 * n
    ref = off[: 2 * n]
    rel = np.abs(got - ref) / np.maximum(ref, 1e-6)
    assert np.mean(rel < 1e-4) >= 0.97, np.mean(rel < 1e-4)
    assert rel.max() < 0.06, rel.max()

    # feature streams: emitted counts line up on the shared grid
    ppg_all = np.concatenate(ppgs)
    vec_all = np.concatenate(vecs)
    assert ppg_all.shape == (2 * n, 64)
    assert vec_all.shape == (2 * n, 256)
    assert np.isfinite(ppg_all).all() and np.isfinite(vec_all).all()
    # hubert frames emitted at push 1 are exact vs offline-on-prefix (the
    # streaming semantics pinned in test_stream_hubert_emission_exact...)
    off_vec = hubert_mod.pred_vec(model_h, params_h, audio[:16000],
                                  window_seconds=20)
    np.testing.assert_allclose(vec_all[: 2 * 46 : 2], off_vec[:46],
                               rtol=1e-4, atol=1e-5)


def test_streaming_svc_push_audio_end_to_end(crepe_tiny, rng):
    """Audio-in -> audio-out: StreamingSvc.push_audio over a full stream
    produces the right sample count (2x: 16 kHz feature rate -> 32 kHz
    synthesis) of finite, non-degenerate audio."""
    from whisper_vits_svc_tpu.infer.stream import StreamingSvc
    from whisper_vits_svc_tpu.models.synthesizer import SynthesizerInfer
    from whisper_vits_svc_tpu.utils.config import config_from_dict

    m_c, p_c = crepe_tiny
    model_w, params_w = _small_whisper()
    model_h, params_h = _small_hubert()

    hp = config_from_dict(dict(
        data=dict(hop_length=320, sampling_rate=32000),
        vits=dict(ppg_dim=64, vec_dim=256, spk_dim=16),
    ))
    model = SynthesizerInfer(
        spec_channels=129, ppg_dim=64, vec_dim=256, spk_dim=16,
        inter_channels=24, hidden_channels=24, filter_channels=48,
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), enc_p_layers=1,
        flow_wn_layers=1, n_flows=1,
    )
    t0 = 8
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t0, 64)), jnp.zeros((1, t0, 256)),
        jnp.full((1, t0), 200.0), jnp.zeros((1, 16)),
        jnp.full((1,), t0, jnp.int32), jnp.zeros((1, t0 * 320, 1)),
    )["params"]

    spk = (rng.standard_normal(16) * 0.1).astype(np.float32)
    svc = StreamingSvc(model, params, spk, hp, block_frames=100,
                       context_frames=50)
    svc.attach_extractor(se.StreamingExtractor(
        whisper=(model_w, params_w), hubert=(model_h, params_h),
        crepe=(m_c, p_c), block_samples=16000))

    audio = _sine(3.0, seed=7)
    out = []
    for s in range(0, len(audio), 16000):
        out.append(svc.push_audio(audio[s : s + 16000]))
    out.append(svc.flush_audio())
    wav = np.concatenate(out)
    # 3 s @16k source -> 300 synthesis frames -> 3 s @32k output
    assert wav.shape == (2 * len(audio),)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() > 1e-4
