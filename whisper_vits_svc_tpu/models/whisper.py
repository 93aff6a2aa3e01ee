"""Whisper audio encoder (PPG content extractor) — TPU-native.

The reference loads OpenAI Whisper large-v2, deletes the text decoder and the
last quarter of encoder blocks (32 -> 24, whisper/inference.py:11-29), and
extracts 1280-d PPG features in 15 s windows. Here only the encoder exists in
the first place: a pre-norm transformer in flax with the same math
(whisper/model.py:57-163), run in bf16 on the MXU (the reference uses fp16 on
GPU) with all 15 s chunks of an utterance batched into ONE device call instead
of a python loop of sequential 15 s inferences.

The mel frontend reproduces whisper/audio.py:68-100 exactly: hann(400),
hop 160, center=True reflect, power spectrum with the LAST FRAME DROPPED,
log10 clamped at 1e-10, per-chunk max-8 floor, (x+4)/4 scaling.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.conv import Conv1d, Dense
from ..ops.mel import mel_filterbank
from ..ops.stft import stft_magnitude

SAMPLE_RATE = 16000
N_FFT = 400
N_MELS = 80
HOP_LENGTH = 160
WINDOW_SECONDS = 15
WINDOW_SAMPLES = WINDOW_SECONDS * SAMPLE_RATE
PPG_HOP = 320  # samples per PPG frame


def log_mel_spectrogram(audio: jax.Array, n_samples: jax.Array | None = None) -> jax.Array:
    """[B, T] 16 kHz audio -> [B, frames, 80] whisper log-mel.

    n_samples [B] marks the real (un-padded) length per row: the per-chunk
    dynamic floor (max-8, whisper/audio.py:96-97) is then computed over real
    frames only, so a zero-padded row gets the same floor as its
    natural-length run would."""
    mag2 = stft_magnitude(audio, N_FFT, HOP_LENGTH, N_FFT, center=True) ** 2
    mag2 = mag2[:, :-1, :]  # whisper drops the final STFT frame (audio.py:92)
    mel_w = jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, N_MELS).T)
    mel = jnp.einsum("btf,fm->btm", mag2, mel_w, preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # per-chunk dynamic floor over (time, mels)
    if n_samples is None:
        floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    else:
        valid = (jnp.arange(log_spec.shape[1])[None, :]
                 < (n_samples // HOP_LENGTH)[:, None])[..., None]
        floor = jnp.max(jnp.where(valid, log_spec, -jnp.inf), axis=(1, 2),
                        keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class WhisperAttention(nn.Module):
    n_state: int
    n_head: int

    @nn.compact
    def __call__(self, x: jax.Array, key_mask: jax.Array | None = None) -> jax.Array:
        q = Dense(self.n_state, name="query")(x)
        k = Dense(self.n_state, use_bias=False, name="key")(x)
        v = Dense(self.n_state, name="value")(x)
        b, t, _ = x.shape
        hd = self.n_state // self.n_head
        scale = hd**-0.25
        qh = q.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3) * scale
        kh = k.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3) * scale
        vh = v.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3)
        qk = jnp.einsum("bhtd,bhsd->bhts", qh, kh, preferred_element_type=jnp.float32)
        if key_mask is not None:
            # padded key positions excluded: real queries then attend over
            # exactly the keys a natural-length run would have
            qk = jnp.where(key_mask[:, None, None, :], qk, -1e9)
        w = jax.nn.softmax(qk, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", w, vh, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t, self.n_state)
        return Dense(self.n_state, name="out")(out)


class WhisperBlock(nn.Module):
    n_state: int
    n_head: int

    @nn.compact
    def __call__(self, x: jax.Array, key_mask: jax.Array | None = None) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, name="attn_ln")(x)
        x = x + WhisperAttention(self.n_state, self.n_head, name="attn")(h, key_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")(x)
        h = Dense(self.n_state * 4, name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + Dense(self.n_state, name="mlp_2")(h)
        return x


class WhisperEncoder(nn.Module):
    """AudioEncoder with the SVC 24-of-32-layer cut baked in (large-v2 dims)."""

    n_mels: int = 80
    n_ctx: int = 1500
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 24
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array,
                 n_frames: jax.Array | None = None) -> jax.Array:
        """mel [B, T, 80] -> PPG [B, T//2, n_state].

        n_frames [B] gives the real mel-frame count per row for zero-padded
        rows: attention keys beyond ceil(n_frames/2) are masked so real
        positions see the same attention context as a natural-length run
        (the only residual deviation is the k=3 conv boundary — last <=2
        output frames)."""
        x = mel.astype(self.compute_dtype)
        x = Conv1d(self.n_state, 3, padding=1, name="conv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = Conv1d(self.n_state, 3, stride=2, padding=1, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        pos = jnp.asarray(sinusoids(self.n_ctx, self.n_state))[: x.shape[1]]
        x = (x + pos).astype(x.dtype)
        key_mask = None
        if n_frames is not None:
            # torch Conv1d(k=3, s=2, p=1): out_len = ceil(in_len / 2)
            n_keys = (n_frames + 1) // 2
            key_mask = jnp.arange(x.shape[1])[None, :] < n_keys[:, None]
        for i in range(self.n_layer):
            x = WhisperBlock(self.n_state, self.n_head, name=f"blocks_{i}")(x, key_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        return x.astype(jnp.float32)


def convert_encoder(sd, n_layer: int = 24, prefix: str = "encoder") -> dict:
    """torch Whisper state_dict -> WhisperEncoder flax params."""
    from . import convert as C

    p = {
        "conv1": C.conv1d(sd, f"{prefix}.conv1"),
        "conv2": C.conv1d(sd, f"{prefix}.conv2"),
        "ln_post": {"scale": C._np(sd[f"{prefix}.ln_post.weight"]),
                    "bias": C._np(sd[f"{prefix}.ln_post.bias"])},
    }
    for i in range(n_layer):
        b = f"{prefix}.blocks.{i}"
        p[f"blocks_{i}"] = {
            "attn": {
                "query": C.dense(sd, f"{b}.attn.query"),
                "key": C.dense(sd, f"{b}.attn.key"),
                "value": C.dense(sd, f"{b}.attn.value"),
                "out": C.dense(sd, f"{b}.attn.out"),
            },
            "attn_ln": {"scale": C._np(sd[f"{b}.attn_ln.weight"]),
                        "bias": C._np(sd[f"{b}.attn_ln.bias"])},
            "mlp_0": C.dense(sd, f"{b}.mlp.0"),
            "mlp_2": C.dense(sd, f"{b}.mlp.2"),
            "mlp_ln": {"scale": C._np(sd[f"{b}.mlp_ln.weight"]),
                       "bias": C._np(sd[f"{b}.mlp_ln.bias"])},
        }
    return p


def load_whisper_encoder(ckpt_path: str, compute_dtype=jnp.float32):
    """Reference large-v2.pt -> (WhisperEncoder, params) with the 8-layer cut."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    dims = ckpt["dims"]
    n_layer = dims["n_audio_layer"] - dims["n_audio_layer"] // 4
    model = WhisperEncoder(
        n_mels=dims["n_mels"], n_ctx=dims["n_audio_ctx"],
        n_state=dims["n_audio_state"], n_head=dims["n_audio_head"],
        n_layer=n_layer, compute_dtype=compute_dtype,
    )
    params = convert_encoder(ckpt["model_state_dict"], n_layer)
    return model, params


@partial(jax.jit, static_argnums=0)
def _ppg_program(model: WhisperEncoder, params, chunks, n_samples, key):
    """ONE compiled program for PPG extraction: [B, WINDOW_SAMPLES] audio rows
    (zero-padded to the static window) -> [B, 750, n_state].

    Module-level jit with the model static: the jit cache is hit on every call
    of the same batch shape — the reference's per-utterance re-trace (and
    round 3's closure-in-function jit) never happens. key=None is the no-noise
    training-prep path (prepare/preprocess_ppg.py:34-38 asymmetry)."""
    mel = log_mel_spectrogram(chunks, n_samples)
    if key is not None:
        mel = mel + jax.random.normal(key, mel.shape) * 0.1
    return model.apply({"params": params}, mel, n_frames=n_samples // HOP_LENGTH)


def ppg_window_batch(model: WhisperEncoder, params, windows: np.ndarray,
                     n_samples: np.ndarray,
                     rng: jax.Array | None = None,
                     as_numpy: bool = True) -> np.ndarray:
    """[B, WINDOW_SAMPLES] zero-padded windows + [B] real lengths -> PPG
    [B, WINDOW_SAMPLES//PPG_HOP, n_state] (rows valid to n_samples//320).

    The cross-utterance batching surface: the preprocessing driver packs 15 s
    windows from MANY utterances into fixed-size batches through this one
    program (SURVEY.md §7.4 batched on-device feature extraction).
    as_numpy=False returns the un-materialized device array so the caller can
    keep multiple batches in flight (dispatch N+1 before blocking on N —
    the double-buffered driver, VERDICT r4 #4)."""
    out = _ppg_program(
        model, params, jnp.asarray(windows, jnp.float32),
        jnp.asarray(n_samples, jnp.int32), rng,
    )
    return np.asarray(out) if as_numpy else out


def pred_ppg(model: WhisperEncoder, params, audio16k: np.ndarray,
             rng: jax.Array | None = None) -> np.ndarray:
    """Whole-utterance PPG extraction (reference whisper/inference.py:32-62).

    Chunks into 15 s windows — the remainder zero-padded to the same static
    window with a length mask, so full windows AND the tail run through one
    batched device call of one compiled program. Adds the +0.1 sigma mel noise
    when rng is given (inference behavior; pass None for the training-prep
    path, prepare/preprocess_ppg.py:34-38); per-window outputs are truncated
    to window_samples // 320 frames and concatenated.
    """
    audln = len(audio16k)
    n_full = audln // WINDOW_SAMPLES
    rem = audln - n_full * WINDOW_SAMPLES
    n_win = n_full + (1 if rem > 0 else 0)
    if n_win == 0:
        return np.zeros((0, model.n_state), np.float32)
    windows = np.zeros((n_win, WINDOW_SAMPLES), np.float32)
    lens = np.full((n_win,), WINDOW_SAMPLES, np.int64)
    if n_full:
        windows[:n_full] = audio16k[: n_full * WINDOW_SAMPLES].reshape(
            n_full, WINDOW_SAMPLES)
    if rem > 0:
        windows[-1, :rem] = audio16k[n_full * WINDOW_SAMPLES :]
        lens[-1] = rem
    ppg = ppg_window_batch(model, params, windows, lens, rng)
    return np.concatenate(
        [ppg[i, : lens[i] // PPG_HOP, :] for i in range(n_win)], axis=0)
