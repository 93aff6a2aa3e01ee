"""Relative-position transformer encoder (the VITS prior-encoder trunk).

Re-implements the semantics of the reference's Encoder / MultiHeadAttention /
FFN (vits/attentions.py:12-72, :161-347, :361-416): learned relative key/value
embeddings over a +/-window_size window (shared across heads), masked softmax
with -1e4 fill, conv FFN with asymmetric same-padding.

The reference realizes the +/-window relative terms by zero-padding the
(2w+1)-row table to 2L-1 rows, taking full [L, 2L-1] matmuls, and converting
rel<->abs with its "skew" pad/reshape trick (:312-347). That is O(L^2)
MEMORY per direction in [L, 2L] intermediates whose unaligned pad/reshapes
XLA:TPU must realize as serial relayout loops — traced at 2.6 ms -> 65.8 ms
for the prior encoder going from 1000- to 2520-frame chunks (round-4
decomposition; a flatten-shift-reshape variant was equally while-bound).
Here the algebra is kept BANDED: only the 2w+1 diagonals the table actually
populates are computed ([L, 2w+1] matmuls, w=4), and band<->dense conversion
is 2w+1 diagonal selects / masked row reductions — reshape-free, fusing
into the adjacent elementwise scores pass. Numerically identical to the
reference; pinned by tests/test_parity_nn.py (incl. an exhaustive
band-helper index test).

Everything is [B, T, C] channels-last.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv1d, Dense


def _band_to_absolute(band: jax.Array, w: int) -> jax.Array:
    """[B, H, L, 2w+1] banded logits (col c = diagonal m = c - w) ->
    [B, H, L, L] dense with zeros outside the band.

    dense[i, j] = band[i, j - i + w] as a sum of 2w+1 diagonal SELECTS —
    deliberately reshape-free: both the reference's skew trick and a
    flatten-shift-reshape variant force XLA:TPU to relayout ~L^2-sized
    tensors through serial while/dynamic-update-slice loops (traced at
    tens of ms per layer at L=2520). The selects fuse into one elementwise
    pass over the [L, L] scores."""
    l = band.shape[-2]
    n_rel = band.shape[-1]
    rel = jnp.arange(l)[None, :] - jnp.arange(l)[:, None]  # j - i
    dense = jnp.zeros(band.shape[:-1] + (l,), band.dtype)
    for c in range(n_rel):
        dense = dense + jnp.where(rel == c - w, band[..., c][..., None], 0.0)
    return dense


def _absolute_to_band(x: jax.Array, w: int) -> jax.Array:
    """[B, H, L, L] dense attention -> [B, H, L, 2w+1] band
    (band[i, c] = x[i, i + c - w], zero out of range) — 2w+1 masked row
    reductions, fused multi-output; no reshapes (see _band_to_absolute)."""
    l = x.shape[-1]
    n_rel = 2 * w + 1
    rel = jnp.arange(l)[None, :] - jnp.arange(l)[:, None]  # j - i
    cols = [jnp.sum(jnp.where(rel == c - w, x, 0.0), axis=-1)
            for c in range(n_rel)]
    return jnp.stack(cols, axis=-1)


def _effective_window(emb: jax.Array, length: int, window_size: int):
    """(table [1, 2w_eff+1, d], w_eff): for length <= window_size the
    reference slices the table down (vits/attentions.py:324-334)."""
    w_eff = min(window_size, length - 1)
    start = window_size - w_eff
    return emb[:, start : start + 2 * w_eff + 1], w_eff


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
            key_rel, w_eff = _effective_window(emb_rel_k, t_s, self.window_size)
            rel_band = jnp.einsum(
                "bhld,nmd->bhlm", qh * scale, key_rel, preferred_element_type=jnp.float32
            )
            scores = scores + _band_to_absolute(rel_band, w_eff)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        if self.p_dropout > 0:
            p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", p_attn, vh, preferred_element_type=jnp.float32)
        if self.window_size is not None:
            value_rel, w_eff = _effective_window(emb_rel_v, t_s, self.window_size)
            weight_band = _absolute_to_band(p_attn, w_eff)
            out = out + jnp.einsum(
                "bhlm,nmd->bhld", weight_band, value_rel, preferred_element_type=jnp.float32
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
