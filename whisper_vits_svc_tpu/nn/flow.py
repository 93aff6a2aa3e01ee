"""SNAC residual-coupling normalizing flow.

Speaker-Normalized Affine Coupling (reference vits/modules.py:250-324,
vits/models.py:55-98): each coupling layer predicts a mean shift from the
untouched half through a WN stack, with both halves whitened by
speaker-dependent (m, v) statistics from a 1x1 conv on the speaker embedding;
the logdet carries both the affine logs (zero here, mean_only) and the
speaker-variance terms. Couplings alternate with channel Flips; `reverse=True`
runs the exact inverse for inference.

Layout: x [B, T, C]; x_mask [B, T, 1]; g (speaker embedding) [B, spk_dim].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv1d
from .wn import WN


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array,
        reverse: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        half = self.channels // 2
        # SNAC statistics from the speaker embedding (modules.py:286-293)
        speaker = Conv1d(2 * half, 1, name="snac")(g[:, None, :])  # [B, 1, 2*half]
        speaker_m, speaker_v = jnp.split(speaker, 2, axis=-1)

        x0, x1 = x[..., :half], x[..., half:]
        x0_norm = (x0 - speaker_m) * jnp.exp(-speaker_v) * x_mask
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0_norm) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            name="enc",
        )(h, x_mask)
        # post conv zero-initialized (modules.py:283-284) -> identity at init
        m = Conv1d(half, 1, zero_init=True, name="post")(h) * x_mask
        logs = jnp.zeros_like(m)

        t_ones = jnp.ones_like(m)
        if not reverse:
            x1_norm = (x1 - speaker_m) * jnp.exp(-speaker_v) * x_mask
            x1 = (m + x1_norm * jnp.exp(logs)) * x_mask
            x = jnp.concatenate([x0, x1], axis=-1)
            logdet = jnp.sum(logs * x_mask, axis=(1, 2)) - jnp.sum(
                speaker_v * t_ones * x_mask, axis=(1, 2)
            )
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
            x1 = (speaker_m + x1 * jnp.exp(speaker_v)) * x_mask
            x = jnp.concatenate([x0, x1], axis=-1)
            logdet = -jnp.sum(logs * x_mask, axis=(1, 2)) + jnp.sum(
                speaker_v * t_ones * x_mask, axis=(1, 2)
            )
        return x, logdet


def flip(x: jax.Array) -> jax.Array:
    """Channel-order flip between couplings (reference vits/modules.py:225-229)."""
    return jnp.flip(x, axis=-1)


class ResidualCouplingBlock(nn.Module):
    """4x (SNAC coupling -> Flip); invertible (reference vits/models.py:55-98)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array,
        reverse: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        layers = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
                name=f"flows_{i}",
            )
            for i in range(self.n_flows)
        ]
        total_logdet = jnp.zeros(x.shape[0], dtype=jnp.float32)
        if not reverse:
            for layer in layers:
                x, logdet = layer(x, x_mask, g, reverse=False)
                total_logdet = total_logdet + logdet
                x = flip(x)
        else:
            for layer in reversed(layers):
                x = flip(x)
                x, logdet = layer(x, x_mask, g, reverse=True)
                total_logdet = total_logdet + logdet
        return x, total_logdet
