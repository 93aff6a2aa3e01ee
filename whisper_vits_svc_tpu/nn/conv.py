"""Convolution primitives in [B, T, C] (channels-last) layout.

XLA lowers `lax.conv_general_dilated` with NHC/HIO dimension numbers straight
onto the MXU, which is why the whole framework keeps time-major channels-last
tensors (the reference's torch code is [B, C, T]; transposition happens only in
checkpoint conversion).

Weight normalization (w = g * v / ||v||) is implemented as an explicit
reparameterization so training dynamics match the reference's
`torch.nn.utils.weight_norm` wrapping (e.g. vits/modules.py:153-176,
vits_decoder/generator.py:72-81); inference folds it away via
`fold_weight_norm` on the param pytree.

Kernel layout: (K, I, O) for Conv1d/ConvTranspose1d, (Kh, Kw, I, O) for
Conv2d. Weight-norm'ed convs store `v` (same layout) and `g`; torch's
`weight_norm(dim=0)` reduces over all-but-dim-0, which for Conv1d means a
per-O norm over (K, I) and for ConvTranspose1d (torch weight (I, O, K), dim0
= I) a per-I norm over (K, O).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _torch_conv_init(fan_in: int):
    """torch nn.Conv default: kaiming_uniform(a=sqrt(5)) == U(-b, b), b=1/sqrt(fan_in)."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _wn_kernel(v: jax.Array, g: jax.Array, norm_axes: Sequence[int]) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(norm_axes), keepdims=True))
    return g * v / (norm + 1e-12)


def declare_nct_wn_conv(mod: nn.Module, kernel_size: int, in_ch: int,
                        features: int):
    """Declare the parameter set of Conv1d(layout="NCT", weight_norm=True,
    use_bias=True) on `mod` — identical names, shapes and initializers — and
    return the folded (kernel, bias). Used by fused kernels that consume raw
    folded weights (e.g. ops/pallas_amp) while staying checkpoint-compatible
    with the module graph. Keep in sync with Conv1d.__call__'s NCT branch."""
    kshape = (kernel_size, in_ch, features)
    fan_in = in_ch * kernel_size
    v = mod.param("v", _torch_conv_init(fan_in), kshape)
    g = mod.param(
        "g",
        lambda key, shape: jnp.sqrt(
            jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)
        ).reshape(shape),
        (1, 1, features),
    )
    bias = mod.param("bias", _torch_conv_init(fan_in), (features,))
    return _wn_kernel(v, g, (0, 1)), bias


def _conv1d_channel_major(x: jax.Array, kernel: jax.Array, padding: int,
                          dilation: int) -> jax.Array:
    """'Same-family' conv on [B, C, T] as k shifted sublane-contracting
    matmuls — no NHC layout assignment.

    An xprof trace showed XLA's layout copies around small-channel NHC convs
    dominating the generator's tail stages (docs/PERFORMANCE.md); with time in
    lanes each tap is one [I, O] x [B, I, T] contraction that stays in the
    native layout, measured 2.5-4.5x faster for C <= 40 at T >= 80k. Also more
    accurate: f32 einsum vs the bf16 MXU passes XLA uses for conv.
    """
    k = kernel.shape[0]
    t_out = x.shape[-1] + 2 * padding - dilation * (k - 1)
    if padding:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    return sum(
        jnp.einsum(
            "io,bit->bot", kernel[m],
            jax.lax.dynamic_slice_in_dim(x, m * dilation, t_out, 2),
            preferred_element_type=x.dtype,
        )
        for m in range(k)
    )


class Conv1d(nn.Module):
    """torch.nn.Conv1d semantics on [B, T, C] input (or [B, C, T] with
    layout="NCT" — see _conv1d_channel_major).

    `padding` is the torch-style symmetric integer pad (in dilated-tap units).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    zero_init: bool = False    # zero kernel+bias (reference coupling post conv)
    layout: str = "NTC"
    # execute with fewer groups via block-diagonal kernel expansion (exact;
    # params unchanged) — see the grouped-conv branch below
    merge_groups_to: int | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.layout == "NCT":
            assert self.stride == 1 and self.groups == 1 and not self.zero_init
            in_ch = x.shape[1]
            kshape = (self.kernel_size, in_ch, self.features)
            fan_in = in_ch * self.kernel_size
            if self.weight_norm:
                v = self.param("v", _torch_conv_init(fan_in), kshape)
                g = self.param(
                    "g",
                    lambda key, shape: jnp.sqrt(
                        jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)
                    ).reshape(shape),
                    (1, 1, self.features),
                )
                kernel = _wn_kernel(v, g, (0, 1))
            else:
                kernel = self.param("kernel", _torch_conv_init(fan_in), kshape)
            y = _conv1d_channel_major(x, kernel.astype(x.dtype), self.padding,
                                      self.dilation)
            if self.use_bias:
                bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
                y = y + bias.astype(y.dtype)[None, :, None]
            return y
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = (in_ch // self.groups) * self.kernel_size
        if self.zero_init:
            kernel = self.param("kernel", nn.initializers.zeros, kshape)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=self.groups,
            )
            return y + bias.astype(y.dtype) if self.use_bias else y
        if self.weight_norm:
            v = self.param("v", _torch_conv_init(fan_in), kshape)
            # g initialized to ||v|| so w == v at init (torch weight_norm behavior)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)
                ).reshape(shape),
                (1, 1, self.features),
            )
            kernel = _wn_kernel(v, g, (0, 1))
        else:
            kernel = self.param("kernel", _torch_conv_init(fan_in), kshape)
        kernel = kernel.astype(x.dtype)
        groups = self.groups
        if self.merge_groups_to is not None and self.merge_groups_to < groups:
            # Execute the grouped conv with FEWER groups by expanding the
            # kernel block-diagonally: m original groups merge into one
            # execution group of m*cig input channels, the off-block weights
            # exactly zero. Params/checkpoints are unchanged and AD through
            # the expansion returns exact grouped gradients; the win is
            # MXU-shaped execution blocks for the MSD's 4-channel groups
            # (per-layer fwd+bwd timings in docs/PERFORMANCE.md round 5).
            gt = self.merge_groups_to
            assert groups % gt == 0
            m = groups // gt
            k_, cig, feat = kernel.shape
            fpg = feat // groups
            kr = kernel.reshape(k_, cig, gt, m, fpg)
            eye = jnp.eye(m, dtype=kernel.dtype)
            kernel = jnp.einsum("kcgbf,ab->kacgbf", kr, eye).reshape(
                k_, m * cig, feat)
            groups = gt
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d semantics on [B, T, C] input.

    out_len = (T - 1) * stride - 2 * padding + kernel_size.
    Implemented as an input-dilated (fractionally strided) conv, the form XLA
    schedules best on TPU (reference upsampler: vits_decoder/generator.py:72-81).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    polyphase: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch, self.features)
        # torch fan_in for ConvTranspose1d init: out_channels * kernel_size
        fan_in = self.features * self.kernel_size
        if self.weight_norm:
            v = self.param("v", _torch_conv_init(fan_in), kshape)
            # torch weight_norm(dim=0) on (I, O, K) weight -> per-input-channel g
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True)
                ).reshape(shape),
                (1, in_ch, 1),
            )
            kernel = _wn_kernel(v, g, (0, 2))
        else:
            kernel = self.param("kernel", _torch_conv_init(fan_in), kshape)
        kernel = kernel.astype(x.dtype)
        pad = self.kernel_size - 1 - self.padding
        if self.polyphase and self.stride > 1:
            y = _conv_transpose_polyphase(
                x, kernel, self.stride, pad, self.features
            )
        else:
            y = jax.lax.conv_general_dilated(
                x,
                jnp.flip(kernel, axis=0),
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _conv_transpose_polyphase(x: jax.Array, kernel: jax.Array, stride: int,
                              pad: int, features: int) -> jax.Array:
    """Transposed conv as `stride` stride-1 phase convs + interleave reshape.

    Replaces the lhs-dilated (zero-stuffed) lowering, whose scatter of the
    dilated input dominated an xprof trace of the decoder. Derivation: with
    P = K - 1 - pad_torch and y the standard transpose-conv output,
        y[s*q + p] = sum_m W_p[m] x[q - m],  W_p[m] = flipK[P - p - s*m],
    so each phase is a plain conv; phases stack into the channel dim and one
    reshape interleaves them (out length == T * stride, exact equality with
    the reference semantics is test-enforced).
    """
    import math as _math

    K, I, O = kernel.shape
    T = x.shape[1]
    s = stride
    P = pad  # caller passes K - 1 - pad_torch, which IS the conv pre-pad P

    # valid m range over all phases: k = P - p - s*m must lie in [0, K)
    m_min = min(_math.ceil((P - p - (K - 1)) / s) for p in range(s))
    m_max = max(_math.floor((P - p) / s) for p in range(s))
    Kp = m_max - m_min + 1

    # phase kernels K'[j, :, p*O + o] = W_p[m_max - j],
    # W_p[m] = flipK[P - p - s*m] = kernel[K - 1 - (P - p - s*m)]
    phase_kernels = []
    for p in range(s):
        taps = []
        for j in range(Kp):
            m = m_max - j
            k_idx = P - p - s * m
            if 0 <= k_idx < K:
                taps.append(kernel[K - 1 - k_idx])
            else:
                taps.append(jnp.zeros((I, O), kernel.dtype))
        phase_kernels.append(jnp.stack(taps, axis=0))  # [Kp, I, O]
    big_kernel = jnp.concatenate(phase_kernels, axis=2)  # [Kp, I, s*O]

    y = jax.lax.conv_general_dilated(
        x, big_kernel, window_strides=(1,),
        padding=[(m_max, -m_min)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # [B, T, s*O]
    b = x.shape[0]
    return y.reshape(b, T, s, O).reshape(b, T * s, O)


# H-to-channel fold factor shared by _fold_freq_kernel and Conv2d's
# freq_folded path (and the matching data-side helpers in
# models/discriminator.py). The folded Conv2d hardwires this one value —
# keep it in a single place so a different r can't silently mismatch.
FOLD_R = 4


def _fold_freq_kernel(kernel: jax.Array, r: int = FOLD_R) -> jax.Array:
    """Fold a (3, kw, I, O) stride-1/pad-1 H-axis conv kernel into the
    r-way H-to-channel space: (3, kw, r*I, r*O).

    With data folded as [B, H/r, W, r*C] (H-blocks outer, channels inner),
    output block j at super-position h' is original output H-index r*h'+j,
    which reads inputs r*h'+j-1 .. r*h'+j+1 — i.e. super-positions h'-1..h'+1
    (kernel 3, padding 1 in folded space). The mapping lands input tap df of
    output block j at folded input index m = r - 1 + j + df (m = sf*r + j_in,
    sf the super-tap, j_in the input block) — a plain pad along the tap axis.
    Zero entries elsewhere: ~(r-1)/r of the folded kernel is structurally
    zero, but every MXU tile is now 128 channels wide instead of I/O wide —
    a large net win for the MRD's 32-channel convs (docs/PERFORMANCE.md).
    Autodiff through the pads/reshapes routes dW back to the true kernel
    exactly (pad transpose drops the zero positions)."""
    kh, kw, i, o = kernel.shape
    assert kh == 3, kh
    blocks = []
    for j in range(r):
        w = jnp.pad(kernel, ((r - 1 + j, 2 * r - 2 - j), (0, 0), (0, 0), (0, 0)))
        w = w.reshape(3, r, kw, i, o).transpose(0, 2, 1, 3, 4)
        blocks.append(w.reshape(3, kw, r * i, o))
    return jnp.concatenate(blocks, axis=3)


class Conv2d(nn.Module):
    """torch.nn.Conv2d semantics on [B, H, W, C] input (used by MPD/MRD).

    freq_folded=True consumes/produces the r=4 H-to-channel folded layout
    (see _fold_freq_kernel): input [B, H/4, W, 4*C_in] -> [B, H/4, W', 4*O].
    Only valid for kernel_size[0]==3, stride[0]==1, padding[0]==1; the
    parameter set (v/g/bias or kernel/bias) is identical to the unfolded
    module, so checkpoints are layout-independent.
    """

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    freq_folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1] // FOLD_R if self.freq_folded else x.shape[-1]
        kh, kw = self.kernel_size
        kshape = (kh, kw, in_ch, self.features)
        fan_in = in_ch * kh * kw
        if self.weight_norm:
            v = self.param("v", _torch_conv_init(fan_in), kshape)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True)
                ).reshape(shape),
                (1, 1, 1, self.features),
            )
            kernel = _wn_kernel(v, g, (0, 1, 2))
        else:
            kernel = self.param("kernel", _torch_conv_init(fan_in), kshape)
        kernel = kernel.astype(x.dtype)
        if self.freq_folded:
            assert kh == 3 and self.stride[0] == 1 and self.padding[0] == 1, (
                "freq_folded requires a stride-1/pad-1 kernel-3 H axis")
            kernel = _fold_freq_kernel(kernel)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            bias = bias.astype(y.dtype)
            y = y + (jnp.tile(bias, FOLD_R) if self.freq_folded else bias)
        return y


class Dense(nn.Module):
    """torch.nn.Linear-compatible dense layer (kernel [in, out])."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", _torch_conv_init(in_ch), (in_ch, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(in_ch), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def fold_weight_norm(params):
    """Fold every {v, g} weight-norm pair in a param pytree into a plain kernel.

    Equivalent of the reference's `remove_weight_norm()` calls before inference
    (vits/models.py:241-243). Returns a new pytree where weight-norm'ed conv
    params are {kernel: w, bias: ...}; modules must then be constructed with
    weight_norm=False and folded=True params.
    """

    def fold(d):
        if isinstance(d, dict):
            if "v" in d and "g" in d:
                v, g = d["v"], d["g"]
                if v.ndim == 3 and g.shape[0] == 1 and g.shape[1] == 1:
                    axes = (0, 1)
                elif v.ndim == 3:
                    axes = (0, 2)
                else:
                    axes = (0, 1, 2)
                out = {"kernel": np.asarray(_wn_kernel(jnp.asarray(v), jnp.asarray(g), axes))}
                if "bias" in d:
                    out["bias"] = d["bias"]
                return out
            return {k: fold(v) for k, v in d.items()}
        return d

    return fold(params)
