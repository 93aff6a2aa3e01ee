"""Relative-position transformer encoder (the VITS prior-encoder trunk).

Re-implements the semantics of the reference's Encoder / MultiHeadAttention /
FFN (vits/attentions.py:12-72, :161-347, :361-416): learned relative key/value
embeddings over a +/-window_size window (shared across heads), masked softmax
with -1e4 fill, conv FFN with asymmetric same-padding.

The relative-logit "skew" trick (_relative_position_to_absolute_position,
reference :312-347) is reproduced with pure reshape/pad ops, which XLA fuses;
everything is [B, T, C] channels-last.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv1d, Dense


def _relative_to_absolute(x: jax.Array) -> jax.Array:
    """[B, H, L, 2L-1] rel-indexed logits -> [B, H, L, L] absolute."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1 :]


def _absolute_to_relative(x: jax.Array) -> jax.Array:
    """[B, H, L, L] absolute attention -> [B, H, L, 2L-1] rel-indexed."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _get_relative_embeddings(emb: jax.Array, length: int, window_size: int) -> jax.Array:
    """Slice/pad the (1, 2w+1, d) table to (1, 2*length-1, d)."""
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: int | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        c: jax.Array,
        attn_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        k_channels = self.channels // self.n_heads
        q = Dense(self.channels, name="conv_q")(x)
        k = Dense(self.channels, name="conv_k")(c)
        v = Dense(self.channels, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        # [B, T, C] -> [B, H, T, Dk]; channel split matches torch's
        # view(b, n_heads, k_channels, t) on [B, C, T]
        qh = q.reshape(b, t_t, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(k_channels)
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", qh * scale, kh, preferred_element_type=jnp.float32
        )
        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, k_channels),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, k_channels),
            )
            key_rel = _get_relative_embeddings(emb_rel_k, t_s, self.window_size)
            rel_logits = jnp.einsum(
                "bhld,nmd->bhlm", qh * scale, key_rel, preferred_element_type=jnp.float32
            )
            scores = scores + _relative_to_absolute(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        if self.p_dropout > 0:
            p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", p_attn, vh, preferred_element_type=jnp.float32)
        if self.window_size is not None:
            rel_weights = _absolute_to_relative(p_attn)
            value_rel = _get_relative_embeddings(emb_rel_v, t_s, self.window_size)
            out = out + jnp.einsum(
                "bhlm,nmd->bhld", rel_weights, value_rel, preferred_element_type=jnp.float32
            )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Dense(self.out_channels, name="conv_o")(out)


class FFN(nn.Module):
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        def same_pad(t):
            if self.kernel_size == 1:
                return t
            pad_l = (self.kernel_size - 1) // 2
            pad_r = self.kernel_size // 2
            return jnp.pad(t, ((0, 0), (pad_l, pad_r), (0, 0)))

        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(same_pad(x * x_mask))
        x = jax.nn.relu(x)
        if self.p_dropout > 0:
            x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(same_pad(x * x_mask))
        return x * x_mask


class RelPosTransformer(nn.Module):
    """Encoder stack (reference vits/attentions.py:12-72)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(
        self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        # x_mask: [B, T, 1] -> attn mask [B, 1, T_t, T_s]
        m = x_mask[..., 0]
        attn_mask = m[:, None, :, None] * m[:, None, None, :]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                name=f"attn_layers_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_layers_1_{i}")(x + y)
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                name=f"ffn_layers_{i}",
            )(x, x_mask, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_layers_2_{i}")(x + y)
        return x * x_mask
