"""WaveNet residual block (WN) — gated dilated conv stack.

TPU-native rendition of the reference WN (vits/modules.py:126-211): dilated
conv -> fused tanh*sigmoid gate -> 1x1 res/skip split, optional global
conditioning injected per-layer from one 1x1 cond conv. The gate fusion the
reference gets from @torch.jit.script (vits/commons.py:126-133) falls out of
XLA elementwise fusion here.

Layout: x [B, T, C], mask [B, T, 1], g [B, 1, gin] or [B, T, gin].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv1d


def gated_activation(x_in: jax.Array, g_l: jax.Array, channels: int) -> jax.Array:
    acts = x_in + g_l
    return jnp.tanh(acts[..., :channels]) * jax.nn.sigmoid(acts[..., channels:])


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = self.hidden_channels
        output = jnp.zeros_like(x)

        if g is not None:
            g = Conv1d(2 * h * self.n_layers, 1, weight_norm=True, name="cond_layer")(g)

        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(
                2 * h,
                self.kernel_size,
                dilation=dilation,
                padding=padding,
                weight_norm=True,
                name=f"in_layers_{i}",
            )(x)
            if g is not None:
                g_l = g[..., i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)

            acts = gated_activation(x_in, g_l, h)
            if self.p_dropout > 0:
                acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)

            res_skip_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(
                res_skip_ch, 1, weight_norm=True, name=f"res_skip_layers_{i}"
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask
