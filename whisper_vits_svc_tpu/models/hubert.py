"""HuBERT-soft content encoder (256-d soft units).

TPU-native rendition of the reference bshall hubert-soft
(hubert/hubert_model.py:11-127): 7-conv stride-320 feature extractor (first
layer GroupNorm), LayerNorm+Linear projection to 768, conv positional
embedding (k=128, groups=16, weight-norm over dim=2), 12 post-norm
transformer layers (768-d, 12 heads, 3072 FFN, gelu), final 768->256
projection. `units()` pads (400-320)/2 on both sides (hubert_model.py:68-72).

Training-side SpecAugment masking exists upstream but is never used by the SVC
pipeline (inference_mode only) and is omitted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.conv import Conv1d, Dense

_FE_SPECS = [(512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
             (512, 3, 2), (512, 2, 2), (512, 2, 2)]


def hubert_num_frames(n_samples: int) -> int:
    """Output frames of `units()` for raw audio length n_samples — the
    valid-conv arithmetic of the 7-layer stride-320 stack after the
    (400-320)/2 pad (hubert_model.py:64-72)."""
    n = n_samples + 2 * ((400 - 320) // 2)
    for _, k, s in _FE_SPECS:
        n = (n - k) // s + 1
    return n


class _InstanceNormTime(nn.Module):
    """torch GroupNorm(512, 512) on [B, C, T] == per-(row, channel) norm over
    time, with an optional frame mask so zero-padded rows get the statistics
    of their natural-length run (biased variance, matching torch)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, frame_mask: jax.Array | None = None) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if frame_mask is None:
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
        else:
            m = frame_mask[..., None].astype(x.dtype)  # [B, T, 1]
            cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(x * m, axis=1, keepdims=True) / cnt
            var = jnp.sum(jnp.square(x - mean) * m, axis=1, keepdims=True) / cnt
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class FeatureExtractor(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array,
                 n_valid0: jax.Array | None = None) -> jax.Array:
        """[B, T, 1] audio -> [B, T//320, 512].

        n_valid0 [B]: real frame count at the FIRST conv's output rate for
        zero-padded rows — all convs are valid (no padding), so with the
        instance-norm statistics masked to real frames, real output frames
        are exactly those of a natural-length run."""
        for i, (ch, k, s) in enumerate(_FE_SPECS):
            x = Conv1d(ch, k, stride=s, use_bias=False, name=f"conv{i}")(x)
            if i == 0:
                mask = None
                if n_valid0 is not None:
                    mask = jnp.arange(x.shape[1])[None, :] < n_valid0[:, None]
                x = _InstanceNormTime(name="norm0")(x, mask)
            x = jax.nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, 768] -> [B, T, 768]; grouped conv k=128 pad 64, drop last."""
        in_ch = x.shape[-1]
        groups = 16
        k = 128
        # torch weight_norm(dim=2) on (O, I/g, K): per-kernel-position norm
        kshape = (k, in_ch // groups, in_ch)
        v = self.param("v", nn.initializers.normal(0.02), kshape)
        g = self.param("g", nn.initializers.ones, (k, 1, 1))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
        kernel = g * v / (norm + 1e-12)
        bias = self.param("bias", nn.initializers.zeros, (in_ch,))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[(64, 64)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
        ) + bias
        return jax.nn.gelu(y[:, :-1, :], approximate=False)


class TransformerLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (post-norm, gelu) semantics."""

    d_model: int = 768
    n_heads: int = 12
    d_ff: int = 3072

    @nn.compact
    def __call__(self, x: jax.Array,
                 key_mask: jax.Array | None = None) -> jax.Array:
        b, t, d = x.shape
        hd = d // self.n_heads
        qkv = Dense(3 * d, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = q.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhtd,bhsd->bhts", qh / np.sqrt(hd), kh,
                            preferred_element_type=jnp.float32)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhts,bhsd->bhtd", w, vh,
                          preferred_element_type=jnp.float32)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
        attn = Dense(d, name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        h = Dense(self.d_ff, name="linear1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = Dense(d, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class HubertSoft(nn.Module):
    n_layers: int = 12

    @nn.compact
    def __call__(self, wav: jax.Array,
                 n_samples: jax.Array | None = None) -> jax.Array:
        """[B, T] 16 kHz audio -> [B, T//320, 256] soft units (units() semantics).

        n_samples [B] gives the real audio length for zero-padded rows; the
        real output frames (the first hubert_num_frames(n_samples) of each
        row) then match a natural-length run exactly: valid convs read the
        same samples, the instance-norm stats are masked, padded frames are
        zeroed before the positional conv (== the natural run's right
        zero-padding), and attention keys beyond the real frames are masked."""
        pad = (400 - 320) // 2
        x = jnp.pad(wav, ((0, 0), (pad, pad)))[..., None]
        n_valid0 = frame_mask = None
        if n_samples is not None:
            padded = n_samples + 2 * pad
            n_valid0 = (padded - _FE_SPECS[0][1]) // _FE_SPECS[0][2] + 1
            n_final = n_valid0
            for _, k, s in _FE_SPECS[1:]:
                n_final = (n_final - k) // s + 1
        x = FeatureExtractor(name="feature_extractor")(x, n_valid0)
        if n_samples is not None:
            frame_mask = jnp.arange(x.shape[1])[None, :] < n_final[:, None]
        x = nn.LayerNorm(epsilon=1e-5, name="fp_norm")(x)
        x = Dense(768, name="fp_projection")(x)
        if frame_mask is not None:
            x = x * frame_mask[..., None]
        x = x + PositionalConvEmbedding(name="positional_embedding")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        for i in range(self.n_layers):
            x = TransformerLayer(name=f"layer_{i}")(x, frame_mask)
        return Dense(256, name="proj")(x)


def convert_hubert(sd) -> dict:
    """torch hubert-soft state_dict -> HubertSoft flax params."""
    from . import convert as C

    def ln(name):
        return {"scale": C._np(sd[f"{name}.weight"]), "bias": C._np(sd[f"{name}.bias"])}

    fe = {}
    for i in range(7):
        fe[f"conv{i}"] = {
            "kernel": C._np(sd[f"feature_extractor.conv{i}.weight"]).transpose(2, 1, 0)
        }
    fe["norm0"] = ln("feature_extractor.norm0")

    pos_v = C._np(sd["positional_embedding.conv.weight_v"])  # (O, I/g, K)
    pos_g = C._np(sd["positional_embedding.conv.weight_g"])  # (1, 1, K)
    p = {
        "feature_extractor": fe,
        "fp_norm": ln("feature_projection.norm"),
        "fp_projection": C.dense(sd, "feature_projection.projection"),
        "positional_embedding": {
            "v": pos_v.transpose(2, 1, 0),
            "g": pos_g.reshape(-1, 1, 1),
            "bias": C._np(sd["positional_embedding.conv.bias"]),
        },
        "norm": ln("norm"),
        "proj": C.dense(sd, "proj"),
    }
    for i in range(12):
        b = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "in_proj": {
                "kernel": C._np(sd[f"{b}.self_attn.in_proj_weight"]).T,
                "bias": C._np(sd[f"{b}.self_attn.in_proj_bias"]),
            },
            "out_proj": C.dense(sd, f"{b}.self_attn.out_proj"),
            "linear1": C.dense(sd, f"{b}.linear1"),
            "linear2": C.dense(sd, f"{b}.linear2"),
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
        }
    return p


def load_hubert_soft(ckpt_path: str):
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return HubertSoft(), convert_hubert(sd)


@partial(jax.jit, static_argnums=0)
def _vec_program(model: HubertSoft, params, wavs, n_samples):
    """ONE compiled program for soft-unit extraction (module-level jit,
    static model): [B, win] zero-padded audio rows + [B] real lengths ->
    [B, frames, 256], rows valid to hubert_num_frames(n_samples)."""
    return model.apply({"params": params}, wavs, n_samples)


def vec_window_batch(model: HubertSoft, params, windows: np.ndarray,
                     n_samples: np.ndarray, as_numpy: bool = True) -> np.ndarray:
    """Cross-utterance batching surface for the preprocessing driver (see
    ppg_window_batch): fixed-size batches of 20 s windows from many
    utterances through one compiled program. as_numpy=False returns the
    un-materialized device array (double-buffered driver, VERDICT r4 #4)."""
    out = _vec_program(
        model, params, jnp.asarray(windows, jnp.float32),
        jnp.asarray(n_samples, jnp.int32))
    return np.asarray(out) if as_numpy else out


def pred_vec(model: HubertSoft, params, audio16k: np.ndarray,
             window_seconds: int = 20) -> np.ndarray:
    """Whole-utterance soft units in 20 s windows (hubert/inference.py:25-50).

    All windows — including the natural-length tail, zero-padded to the
    static window with a length mask (exact: see HubertSoft.__call__) — run
    through one batched call of one compiled program."""
    sr = 16000
    win = window_seconds * sr
    n = len(audio16k)
    # reference walks `while idx + win < n`: a window starts at every
    # multiple of win strictly below n, so an exact-multiple length gets a
    # full-window "tail" (hubert/inference.py:30-40)
    starts = list(range(0, n, win)) if n > 0 else []
    if not starts:
        return np.zeros((0, 256), np.float32)
    windows = np.zeros((len(starts), win), np.float32)
    lens = np.empty((len(starts),), np.int64)
    for i, s in enumerate(starts):
        seg = audio16k[s : s + win]
        windows[i, : len(seg)] = seg
        lens[i] = len(seg)
    vec = vec_window_batch(model, params, windows, lens)
    return np.concatenate(
        [vec[i, : hubert_num_frames(int(lens[i])), :] for i in range(len(starts))],
        axis=0)
