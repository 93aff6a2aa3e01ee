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


# ----------------------------------------------------------- fused polyphase
#
# An xprof trace of the full synthesis graph showed ~45% of device time in
# copy / dynamic-update-slice / slice ops — the zero-stuffing, trimming and
# padding inside the 91 SnakeAlias instances. The x2-up -> snake -> x2-down
# chain is LTI around the pointwise snake, so it decomposes into polyphase
# form: two stride-1 depthwise convs produce the even/odd upsampled phases,
# the snake applies per phase, and two more stride-1 depthwise convs combine
# them — no 2x intermediate, no lhs-dilation scatter, no trim slices.
# Phase taps are derived numerically from the reference resamplers at build
# time; equality (including replicate-padded edges) is test-enforced.


def _np_upsample(x: np.ndarray, ratio: int = 2, k: int = 12) -> np.ndarray:
    """NumPy mirror of upsample1d (1-D), used for tap probing + tests."""
    f = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k).astype(np.float64)
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    xp = np.pad(x.astype(np.float64), (pad, pad), mode="edge")
    xd = np.zeros(len(xp) * ratio - (ratio - 1))
    xd[::ratio] = xp
    yf = ratio * np.convolve(xd, f, "full")
    return yf[pad_left : len(yf) - pad_right]


def _np_downsample(x: np.ndarray, ratio: int = 2, k: int = 12) -> np.ndarray:
    """NumPy mirror of downsample1d (1-D)."""
    f = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k).astype(np.float64)
    even = k % 2 == 0
    pl = k // 2 - int(even)
    pr = k // 2
    xp = np.pad(x.astype(np.float64), (pl, pr), mode="edge")
    n_out = (len(xp) - k) // ratio + 1
    return np.array([xp[t * ratio : t * ratio + k] @ f for t in range(n_out)])


@lru_cache(maxsize=None)
def _polyphase_taps(k_up: int = 12, k_down: int = 12):
    """Derive (up_even, up_odd, up_off, down_even, down_odd, down_offs).

    up phase p: up[2t+p] = sum_m A_p[m] * x[t + up_off + m]
    down:       out[t]   = sum_m De[m] * s_e[t + oe + m]
                         + sum_m Do[m] * s_o[t + oo + m]
    where s_e/s_o are the even/odd upsampled phases.
    """
    T = 64
    U = np.stack([_np_upsample(np.eye(T)[i], 2, k_up) for i in range(T)], axis=1)
    mid = T // 2

    def row_taps(row):
        nz = np.nonzero(np.abs(U[row]) > 1e-10)[0]
        return int(nz[0]), U[row, nz[0] : nz[-1] + 1]

    s0, a_even = row_taps(2 * mid)
    s1, a_odd = row_taps(2 * mid + 1)
    up_off_e = s0 - mid
    up_off_o = s1 - mid

    S = 2 * T
    D = np.stack([_np_downsample(np.eye(S)[i], 2, k_down) for i in range(S)], axis=1)
    trow = D[mid]
    nz = np.nonzero(np.abs(trow) > 1e-10)[0]
    evens = [p for p in nz if p % 2 == 0]
    odds = [p for p in nz if p % 2 == 1]
    d_even = trow[evens]
    d_odd = trow[odds]
    d_off_e = evens[0] // 2 - mid
    d_off_o = (odds[0] - 1) // 2 - mid
    return (
        a_even.astype(np.float32), a_odd.astype(np.float32), up_off_e, up_off_o,
        d_even.astype(np.float32), d_odd.astype(np.float32), d_off_e, d_off_o,
    )


def _depthwise_valid(x: jax.Array, taps: np.ndarray) -> jax.Array:
    C = x.shape[-1]
    kernel = jnp.asarray(np.tile(taps[:, None, None], (1, 1, C)), dtype=x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C,
    )


def _depthwise_pad(x: jax.Array, taps: np.ndarray, pad: tuple[int, int]) -> jax.Array:
    C = x.shape[-1]
    kernel = jnp.asarray(np.tile(taps[:, None, None], (1, 1, C)), dtype=x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[pad],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C,
    )


def snake_alias_fused(x: jax.Array, alpha: jax.Array, beta: jax.Array,
                      k_up: int = 12, k_down: int = 12,
                      exact_edges: bool = True) -> jax.Array:
    """Fused polyphase up2 -> SnakeBeta -> down2 on [B, T, C].

    exact_edges=True is bit-compatible with
    downsample1d(SnakeBeta(upsample1d(x))) including the replicate-padded
    boundaries (see test_snake_fused_matches_reference). exact_edges=False
    zero-pads inside the convs instead — interior samples identical, only the
    outermost ~6 samples differ; safe wherever chunk seams are overlap-trimmed
    (the chunked/streaming inference paths) and it avoids materializing any
    padded copy of the activation.
    """
    ae, ao, oe, oo, de, do_, doe, doo = _polyphase_taps(k_up, k_down)
    a = jnp.exp(alpha).astype(x.dtype)
    b = jnp.exp(beta).astype(x.dtype)

    def snake(u):
        return u + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(u * a))

    if not exact_edges:
        s_e = snake(_depthwise_pad(x, ae, (-oe, oe + len(ae) - 1)))
        s_o = snake(_depthwise_pad(x, ao, (-oo, oo + len(ao) - 1)))
        return (
            _depthwise_pad(s_e, de, (-doe, doe + len(de) - 1))
            + _depthwise_pad(s_o, do_, (-doo, doo + len(do_) - 1))
        )

    # one clamped pad of x covering both phase convs
    m_lo = min(oe, oo)
    m_hi = max(oe + len(ae) - 1, oo + len(ao) - 1)
    xp = jnp.pad(x, ((0, 0), (-m_lo, m_hi), (0, 0)), mode="edge")

    def up_phase(taps, off):
        start = off - m_lo
        return _depthwise_valid(xp[:, start : start + x.shape[1] + len(taps) - 1], taps)

    s_e = snake(up_phase(ae, oe))
    s_o = snake(up_phase(ao, oo))

    # clamp-extend the phases; cross-phase clamps: s[-i] == s[0] (even phase),
    # s[2T-1+i] == s[2T-1] (odd phase)
    pe_l, po_l = max(0, -doe), max(0, -doo)
    pe_r = max(0, doe + len(de) - 1)
    po_r = max(0, doo + len(do_) - 1)
    first = s_e[:, :1]
    last = s_o[:, -1:]

    def extend(s, pl, pr):
        parts = []
        if pl:
            parts.append(jnp.repeat(first, pl, axis=1))
        parts.append(s)
        if pr:
            parts.append(jnp.repeat(last, pr, axis=1))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else s

    # alignment invariants for the pad-then-valid-conv formulation
    T = x.shape[1]
    assert doe <= 0 and doo <= 0, (doe, doo)
    assert (pe_l + T + pe_r) - len(de) + 1 == T
    assert (po_l + T + po_r) - len(do_) + 1 == T

    se_pad = extend(s_e, pe_l, pe_r)
    so_pad = extend(s_o, po_l, po_r)
    out = (
        _depthwise_valid(se_pad, de)
        + _depthwise_valid(so_pad, do_)
    )
    return out


def _dw_valid_cm(x: jax.Array, taps: np.ndarray) -> jax.Array:
    """Depthwise valid correlation on [B, C, T] as shifted adds (VPU-only,
    no conv layout assignment; also f32-exact where the conv form goes through
    bf16 MXU passes)."""
    L = x.shape[-1] - len(taps) + 1
    return sum(float(taps[m]) * jax.lax.dynamic_slice_in_dim(x, m, L, 2)
               for m in range(len(taps)))


def _dw_pad_cm(x: jax.Array, taps: np.ndarray, pad: tuple[int, int]) -> jax.Array:
    """Zero-pad (negative = crop) then valid correlation, on [B, C, T]."""
    lo, hi = pad
    if lo < 0:
        x = x[:, :, -lo:]
        lo = 0
    if hi < 0:
        x = x[:, :, :hi]
        hi = 0
    if lo or hi:
        x = jnp.pad(x, ((0, 0), (0, 0), (lo, hi)))
    return _dw_valid_cm(x, taps)


def snake_alias_fused_cm(x: jax.Array, alpha: jax.Array, beta: jax.Array,
                         k_up: int = 12, k_down: int = 12,
                         exact_edges: bool = True) -> jax.Array:
    """Channel-major twin of `snake_alias_fused` on [B, C, T].

    Same polyphase math; every depthwise conv becomes shifted adds along the
    lane (time) axis, so the whole activation is a single elementwise fusion
    in the [B, C, T] layout the generator tail stages run in.
    """
    ae, ao, oe, oo, de, do_, doe, doo = _polyphase_taps(k_up, k_down)
    a = jnp.exp(alpha).astype(x.dtype)[None, :, None]
    b = jnp.exp(beta).astype(x.dtype)[None, :, None]

    def snake(u):
        return u + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(u * a))

    if not exact_edges:
        s_e = snake(_dw_pad_cm(x, ae, (-oe, oe + len(ae) - 1)))
        s_o = snake(_dw_pad_cm(x, ao, (-oo, oo + len(ao) - 1)))
        return (
            _dw_pad_cm(s_e, de, (-doe, doe + len(de) - 1))
            + _dw_pad_cm(s_o, do_, (-doo, doo + len(do_) - 1))
        )

    T = x.shape[-1]
    m_lo = min(oe, oo)
    m_hi = max(oe + len(ae) - 1, oo + len(ao) - 1)
    xp = jnp.pad(x, ((0, 0), (0, 0), (-m_lo, m_hi)), mode="edge")

    def up_phase(taps, off):
        start = off - m_lo
        return _dw_valid_cm(
            jax.lax.dynamic_slice_in_dim(xp, start, T + len(taps) - 1, 2), taps)

    s_e = snake(up_phase(ae, oe))
    s_o = snake(up_phase(ao, oo))

    pe_l, po_l = max(0, -doe), max(0, -doo)
    pe_r = max(0, doe + len(de) - 1)
    po_r = max(0, doo + len(do_) - 1)
    first = s_e[:, :, :1]
    last = s_o[:, :, -1:]

    def extend(s, pl, pr):
        parts = []
        if pl:
            parts.append(jnp.repeat(first, pl, axis=2))
        parts.append(s)
        if pr:
            parts.append(jnp.repeat(last, pr, axis=2))
        return jnp.concatenate(parts, axis=2) if len(parts) > 1 else s

    assert doe <= 0 and doo <= 0, (doe, doo)
    return (_dw_valid_cm(extend(s_e, pe_l, pe_r), de)
            + _dw_valid_cm(extend(s_o, po_l, po_r), do_))


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
    """2x upsample -> SnakeBeta -> 2x downsample (reference act.py:109-128).

    fused=True (default) runs the polyphase formulation (same numerics, ~2x
    less data movement — see snake_alias_fused); fused=False keeps the
    literal reference op chain.
    """

    channels: int
    up_ratio: int = 2
    down_ratio: int = 2
    up_kernel_size: int = 12
    down_kernel_size: int = 12
    fused: bool = True
    exact_edges: bool = True
    layout: str = "NTC"
    # Single-VMEM-pass Pallas kernel for the NCT path (ops/pallas_snake.py).
    # Differentiable: forward runs the kernel, backward rematerializes through
    # the jnp channel-major form (snake_alias_cm_pallas_diff), so training
    # graphs may enable it too.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.layout == "NCT":
            assert self.up_ratio == 2 and self.down_ratio == 2
            alpha, beta = _ActParams(self.channels, name="act")()
            if self.use_pallas and self.exact_edges:
                from ..ops import pallas_snake

                if pallas_snake.use_pallas_for(x.shape[1], x.shape[2],
                                               x.shape[0]):
                    return pallas_snake.snake_alias_cm_pallas_diff(
                        x, alpha, beta, self.up_kernel_size,
                        self.down_kernel_size)
            return snake_alias_fused_cm(x, alpha, beta, self.up_kernel_size,
                                        self.down_kernel_size,
                                        exact_edges=self.exact_edges)
        if self.fused and self.up_ratio == 2 and self.down_ratio == 2:
            # params live under the same "act" scope (act/alpha, act/beta) as
            # the unfused path, so checkpoints are interchangeable
            alpha, beta = _ActParams(self.channels, name="act")()
            return snake_alias_fused(x, alpha, beta, self.up_kernel_size,
                                     self.down_kernel_size,
                                     exact_edges=self.exact_edges)
        x = upsample1d(x, self.up_ratio, self.up_kernel_size)
        x = SnakeBeta(x.shape[-1], name="act")(x)
        return downsample1d(x, self.down_ratio, self.down_kernel_size)


class _ActParams(nn.Module):
    channels: int

    @nn.compact
    def __call__(self):
        alpha = self.param("alpha", nn.initializers.zeros, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        return alpha, beta
