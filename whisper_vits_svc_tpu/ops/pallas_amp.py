"""Pallas TPU kernel: one fused AMP-block dilation iteration.

An AMPBlock iteration (reference vits_decoder/bigv.py:19-64) is

    x + conv2_{k,d=1}( SnakeAlias( conv1_{k,d}( SnakeAlias(x) ) ) )

On the generator's tail stages this chain is pure HBM traffic: two Pallas
SnakeAlias calls (2 passes each), two channel-mix convs (2 passes each) and
the residual add — ~9 full-tensor passes per iteration. Here the whole
iteration runs per time-tile in VMEM: the two anti-aliased snake activations
(ops/pallas_snake.snake_range), the two k-tap weight-norm-folded channel-mix
convolutions as per-tap (C, C) x (C, T_tile) MXU matmuls, and the residual —
one HBM read of x and one write of the result.

Boundary semantics match the jnp modules exactly: each SnakeAlias sees its
input through an edge-replicate pad + interleaved-phase clamps (handled by
snake_range against global positions) and each conv zero-pads ("same", torch
padding (k*d-d)//2) — zeroing is a masked select on the intermediate's
global position. All intermediates are computed over widened position
ranges so each tile is self-contained; the clamp values (positions 0 / T-1)
are only ever needed by the first/last tiles, where they are locally
available.

Zero-copy blocking identical to pallas_snake: main tile + two neighboring
128-lane halo blocks over the same x (index-clamped at the array ends),
boundary tiles rebuild edge replication with masked selects. The tile halo
is r2 + 12 + r1 <= 42 samples for the base config's largest (k=11, d=5)
iteration, so one 128-lane halo block per side always suffices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_snake import _LANE, _tap_floats, snake_range, use_pallas_for

# the fused-iteration working set is larger than the lone activation's:
# x(+halo), s1, c1, s2, out plus each snake_range's phase temps — budget for
# ~24 block-sized f32 buffers
_VMEM_BUDGET = 10 * 1024 * 1024


def use_fused_iter(c: int, t: int, b: int = 1) -> bool:
    return use_pallas_for(c, t, b)


def _divisor_tile(c: int, t: int) -> int | None:
    if t % _LANE:
        return None
    max_tt = _VMEM_BUDGET // (24 * 4 * max(c, 8))
    g = t // _LANE
    best = 0
    for d in range(1, g + 1):
        if g % d == 0 and d * _LANE <= max_tt:
            best = max(best, d * _LANE)
    return best if best >= 4 * _LANE else None


def amp_iter_ref(x, k1, b1, a1, be1, k2, b2, a2, be2, kernel_size: int, d: int):
    """jnp reference of one fused iteration (for parity tests and fallback).

    x: [B, C, T]; k1/k2: (K, C, C) folded conv kernels ((K, I, O) layout);
    b1/b2: (C,) biases; a1/be1/a2/be2: per-channel log-scale snake params.
    """
    from ..nn.conv import _conv1d_channel_major
    from ..nn.snake import snake_alias_fused_cm

    pad1 = (kernel_size * d - d) // 2
    pad2 = (kernel_size - 1) // 2
    s1 = snake_alias_fused_cm(x, a1, be1, exact_edges=True)
    c1 = _conv1d_channel_major(s1, k1, pad1, d) + b1[None, :, None]
    s2 = snake_alias_fused_cm(c1, a2, be2, exact_edges=True)
    c2 = _conv1d_channel_major(s2, k2, pad2, 1) + b2[None, :, None]
    return x + c2


def _conv_range(s, s_lo: int, out_lo: int, out_len: int, w_ref, bias,
                k: int, d: int, c: int):
    """Channel-mix conv over positions [t0+out_lo, +out_len) from s (C, L)
    covering [t0+s_lo, ...), already zero-masked outside the signal domain.
    w_ref holds the folded kernel as (k*C, C) = per-tap (O, I) blocks.
    c_out[q] = bias + sum_m W_m @ s[q + m*d - (k*d-d)//2]."""
    pad = (k * d - d) // 2
    out = bias
    for m in range(k):
        off = out_lo + m * d - pad - s_lo
        w_m = w_ref[m * c : (m + 1) * c, :].astype(jnp.float32)
        # HIGHEST: Mosaic's default single-pass bf16 MXU matmul costs ~1e-3
        # relative error; the 3-pass form matches the jnp einsum composition
        out = out + jax.lax.dot(
            w_m, s[:, off : off + out_len],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out


def _zero_mask(s, lo: int, t_real: int, t0):
    """Zero s (C, L) wherever its global position (t0+lo+l) is outside
    [0, t_real) — the conv zero-pad semantics."""
    pos = t0 + lo + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    return jnp.where((pos < 0) | (pos > t_real - 1), 0.0, s)


def _edge_fix(s, lo: int, t_real: int, t0):
    """Replace s (C, L) outside [0, t_real) with its boundary values — the
    edge-replicate pad every SnakeAlias applies to its input. The boundary
    columns are recovered by masked reductions; they are only consumed by
    the first/last tiles, whose ranges contain them."""
    pos = t0 + lo + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    s0 = jnp.sum(jnp.where(pos == 0, s, 0.0), axis=1, keepdims=True)
    sn = jnp.sum(jnp.where(pos == t_real - 1, s, 0.0), axis=1, keepdims=True)
    return jnp.where(pos < 0, s0, jnp.where(pos > t_real - 1, sn, s))


def _kernel(main_ref, hl_ref, hr_ref, w1_ref, b1_ref, a1_ref, ib1_ref,
            w2_ref, b2_ref, a2_ref, ib2_ref, out_ref, *, taps, tt: int,
            t_real: int, k: int, d: int, c: int, halo: int):
    r2 = (k - 1) // 2
    r1 = d * (k - 1) // 2
    # position ranges (relative to t0) each stage is computed over
    s2_lo, s2_len = -r2, tt + 2 * r2
    c1_lo, c1_len = s2_lo - 6, s2_len + 12
    s1_lo, s1_len = c1_lo - r1, c1_len + 2 * r1
    x_lo = s1_lo - 6  # x covers [x_lo, x_lo + s1_len + 12) = [-halo, tt+halo)

    xl = hl_ref[0][:, _LANE - halo :]
    xr = hr_ref[0][:, :halo]
    x = jnp.concatenate([xl, main_ref[0], xr], axis=-1).astype(jnp.float32)
    t0 = pl.program_id(1) * tt
    x = _edge_fix(x, x_lo, t_real, t0)

    a1 = a1_ref[:].astype(jnp.float32)
    ib1 = ib1_ref[:].astype(jnp.float32)
    a2 = a2_ref[:].astype(jnp.float32)
    ib2 = ib2_ref[:].astype(jnp.float32)

    s1 = snake_range(x, x_lo, s1_lo, s1_len, a1, ib1, taps, t_real, t0)
    s1 = _zero_mask(s1, s1_lo, t_real, t0)
    c1 = _conv_range(s1, s1_lo, c1_lo, c1_len, w1_ref,
                     b1_ref[:].astype(jnp.float32), k, d, c)
    c1 = _edge_fix(c1, c1_lo, t_real, t0)
    s2 = snake_range(c1, c1_lo, s2_lo, s2_len, a2, ib2, taps, t_real, t0)
    s2 = _zero_mask(s2, s2_lo, t_real, t0)
    c2 = _conv_range(s2, s2_lo, 0, tt, w2_ref,
                     b2_ref[:].astype(jnp.float32), k, 1, c)

    out = x[:, -x_lo : -x_lo + tt] + c2
    out_ref[0] = out.astype(out_ref.dtype)


def amp_iter(x, k1, b1, a1, be1, k2, b2, a2, be2, kernel_size: int, d: int,
             interpret: bool | None = None):
    """One fused AMP dilation iteration on [B, C, T] (see module docstring).

    Falls back to the jnp composition when no lane-aligned divisor tile
    exists or the halo would exceed one 128-lane block.
    """
    b, c, t = x.shape
    halo = (kernel_size - 1) // 2 + 12 + d * (kernel_size - 1) // 2
    tt = _divisor_tile(c, t)
    if tt is None or c > 128 or halo > _LANE or halo > tt:
        return amp_iter_ref(x, k1, b1, a1, be1, k2, b2, a2, be2, kernel_size, d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    taps = _tap_floats(12, 12)
    k = kernel_size
    # per-tap (O, I) blocks stacked on sublanes: (k*C, C)
    w1 = jnp.swapaxes(k1, 1, 2).reshape(k * c, c).astype(jnp.float32)
    w2 = jnp.swapaxes(k2, 1, 2).reshape(k * c, c).astype(jnp.float32)
    b1v = b1.reshape(-1, 1).astype(jnp.float32)
    b2v = b2.reshape(-1, 1).astype(jnp.float32)
    a1v = jnp.exp(a1.astype(jnp.float32)).reshape(-1, 1)
    ib1v = 1.0 / (jnp.exp(be1.astype(jnp.float32)) + 1e-9).reshape(-1, 1)
    a2v = jnp.exp(a2.astype(jnp.float32)).reshape(-1, 1)
    ib2v = 1.0 / (jnp.exp(be2.astype(jnp.float32)) + 1e-9).reshape(-1, 1)

    nt = t // tt
    nb = tt // _LANE
    last = t // _LANE - 1
    kernel = functools.partial(_kernel, taps=taps, tt=tt, t_real=t, k=k, d=d,
                               c=c, halo=halo)
    rep = lambda spec_shape: pl.BlockSpec(  # noqa: E731 - replicated operand
        spec_shape, lambda bi, ti: tuple(0 for _ in spec_shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, t), x.dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, c, tt), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, _LANE),
                         lambda bi, ti: (bi, 0, jnp.maximum(ti * nb - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, _LANE),
                         lambda bi, ti: (bi, 0, jnp.minimum((ti + 1) * nb, last)),
                         memory_space=pltpu.VMEM),
            rep((k * c, c)), rep((c, 1)), rep((c, 1)), rep((c, 1)),
            rep((k * c, c)), rep((c, 1)), rep((c, 1)), rep((c, 1)),
        ],
        out_specs=pl.BlockSpec((1, c, tt), lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, w1, b1v, a1v, ib1v, w2, b2v, a2v, ib2v)
