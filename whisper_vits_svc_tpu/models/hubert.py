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

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.conv import Conv1d, Dense


class FeatureExtractor(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, 1] audio -> [B, T//320, 512]."""
        specs = [(512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                 (512, 3, 2), (512, 2, 2), (512, 2, 2)]
        for i, (ch, k, s) in enumerate(specs):
            x = Conv1d(ch, k, stride=s, use_bias=False, name=f"conv{i}")(x)
            if i == 0:
                # GroupNorm(512, 512) == per-channel instance norm over time
                x = nn.GroupNorm(num_groups=512, epsilon=1e-5, name="norm0")(x)
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
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, d = x.shape
        hd = d // self.n_heads
        qkv = Dense(3 * d, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = q.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(
            jnp.einsum("bhtd,bhsd->bhts", qh / np.sqrt(hd), kh,
                       preferred_element_type=jnp.float32),
            axis=-1,
        )
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
    def __call__(self, wav: jax.Array) -> jax.Array:
        """[B, T] 16 kHz audio -> [B, T//320, 256] soft units (units() semantics)."""
        pad = (400 - 320) // 2
        x = jnp.pad(wav, ((0, 0), (pad, pad)))[..., None]
        x = FeatureExtractor(name="feature_extractor")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="fp_norm")(x)
        x = Dense(768, name="fp_projection")(x)
        x = x + PositionalConvEmbedding(name="positional_embedding")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        for i in range(self.n_layers):
            x = TransformerLayer(name=f"layer_{i}")(x)
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


def pred_vec(model: HubertSoft, params, audio16k: np.ndarray,
             window_seconds: int = 20) -> np.ndarray:
    """Whole-utterance soft units in 20 s windows (hubert/inference.py:25-50)."""
    sr = 16000
    win = window_seconds * sr
    outs = []
    idx = 0
    n = len(audio16k)

    @jax.jit
    def run(wav):
        return model.apply({"params": params}, wav)

    while idx + win < n:
        outs.append(np.asarray(run(jnp.asarray(audio16k[idx : idx + win])[None]))[0])
        idx += win
    if idx < n:
        tail = audio16k[idx:]
        outs.append(np.asarray(model.apply({"params": params}, jnp.asarray(tail)[None]))[0])
    if not outs:
        return np.zeros((0, 256), np.float32)
    return np.concatenate(outs, axis=0)
