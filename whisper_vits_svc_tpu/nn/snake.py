"""Anti-aliased snake activation (SnakeBeta wrapped in Kaiser-sinc 2x resample).

TPU-first re-design of the reference's alias-free activation chain
(vits_decoder/alias/act.py:36-128, resample.py:10-57, filter.py:28-94,
stylegan3-style): the x2 Kaiser-windowed sinc upsample, the per-channel
log-scale SnakeBeta `x + (1/b) sin^2(a x)`, and the x2 lowpass downsample.

The resampling filters are compile-time numpy constants; up/downsampling are
depthwise (grouped) convs which XLA maps to efficient TPU convolutions. The
whole up->snake->down chain is elementwise+conv and fuses into the surrounding
AMPBlock graph.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _kaiser_beta(A: float) -> float:
    if A > 50.0:
        return 0.1102 * (A - 8.7)
    if A >= 21.0:
        return 0.5842 * (A - 21.0) ** 0.4 + 0.07886 * (A - 21.0)
    return 0.0


@lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass, sum-normalized; [kernel_size] float32.

    Matches reference vits_decoder/alias/filter.py:28-57 (even and odd sizes).
    """
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    beta = _kaiser_beta(A)
    window = np.kaiser(kernel_size, beta)  # symmetric (periodic=False)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def upsample1d(x: jax.Array, ratio: int = 2, kernel_size: int | None = None) -> jax.Array:
    """x2 (or xN) anti-aliased upsample on [B, T, C].

    Matches reference alias/resample.py:10-33: replicate-pad, zero-stuffed
    transposed depthwise conv with the Kaiser sinc filter, then edge trim.
    """
    if kernel_size is None:
        kernel_size = int(6 * ratio // 2) * 2
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    C = x.shape[-1]
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    kernel = jnp.asarray(np.tile(filt[:, None, None], (1, 1, C)), dtype=x.dtype)

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # conv_transpose == lhs-dilated conv with flipped kernel; sinc is symmetric
    # for even sizes only after flip, so flip explicitly for exact parity.
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
    )
    y = ratio * y
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample1d(x: jax.Array, ratio: int = 2, kernel_size: int | None = None) -> jax.Array:
    """xN anti-aliased downsample on [B, T, C] (reference alias/resample.py:36-49)."""
    if kernel_size is None:
        kernel_size = int(6 * ratio // 2) * 2
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    C = x.shape[-1]
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    kernel = jnp.asarray(np.tile(filt[:, None, None], (1, 1, C)), dtype=x.dtype)

    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(ratio,),
        padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
    )


class SnakeBeta(nn.Module):
    """x + (1/beta) * sin^2(alpha * x), per-channel log-scale alpha/beta.

    Reference vits_decoder/alias/act.py:36-92 with alpha_logscale=True
    (params initialized to zeros -> exp() == 1).
    """

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.zeros, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        a = jnp.exp(alpha).astype(x.dtype)
        b = jnp.exp(beta).astype(x.dtype)
        return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


class SnakeAlias(nn.Module):
    """2x upsample -> SnakeBeta -> 2x downsample (reference act.py:109-128)."""

    channels: int
    up_ratio: int = 2
    down_ratio: int = 2
    up_kernel_size: int = 12
    down_kernel_size: int = 12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = upsample1d(x, self.up_ratio, self.up_kernel_size)
        x = SnakeBeta(x.shape[-1], name="act")(x)
        return downsample1d(x, self.down_ratio, self.down_kernel_size)
