"""Pallas TPU kernel: fused polyphase anti-aliased snake activation.

Single-pass [B, C, T] implementation of the reference's SnakeAlias chain
(vits_decoder/alias/act.py:109-128 = x2 Kaiser-sinc upsample -> SnakeBeta ->
x2 lowpass downsample), numerically identical to
``nn.snake.snake_alias_fused_cm(..., exact_edges=True)`` which is itself
exactness-tested against the literal reference op chain.

Why a kernel: the jnp channel-major form is already a big win over the conv
form (docs/PERFORMANCE.md), but XLA still materializes the two post-snake
phase signals to HBM between the elementwise fusions — the op is HBM-bound at
>= 4 full-tensor passes. Here the whole chain (2 six-tap up-phase FIRs, the
snake nonlinearity, 2 six-tap down-phase FIRs, and the replicate-edge
clamping) runs in VMEM: one HBM read of x, one HBM write of the result,
~2 passes total. The generator applies this activation 91 times per chunk on
tensors up to [1, 10, 800k], so it dominates synthesis time.

Grid/blocking: grid (B, C-tiles, T-tiles). The T-tile halo (6 left / 5 right
input samples) is fed through a second BlockSpec over the same padded input
whose index_map points at the 16 samples following each tile — overlapping
halo reads without manual DMA, so Pallas double-buffers both streams.

Boundary semantics (exact parity with the reference's edge-replicate pads):
the up-phase FIRs read x through an edge-replicated pad, and the downsample
input s (the interleaved post-snake phases) is clamped as s[i<0] := s[0]
(even phase head) and s[i>2T-1] := s[2T-1] (odd phase tail). In-kernel that
is two masked selects against the global position index, with the two clamp
values recovered by masked reductions (position == 0 / == T-1) — no gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.snake import _polyphase_taps

_LANE = 128
_PAD = 8  # left pad of x inside the padded buffer

# Shape gate (device-trace measured, v5e): the kernel is 3.6-4.6x faster than
# the jnp CM form on the narrow-channel long-time tail stages (C=10/T=320k:
# 2.25 -> 0.62 ms; C=20/T=160k: 2.24 -> 0.49 ms) but neutral at C=40/T=80k
# (0.33 vs 0.39 ms) and 2x slower on short tensors (C=160/T=5k) where grid
# overhead dominates. XLA's CM fusion is only sublane-starved at small C.
_MAX_C = 32
_MIN_T = 50_000


def use_pallas_for(c: int, t: int) -> bool:
    """True where the kernel beats the jnp channel-major form (see above)."""
    return c <= _MAX_C and t >= _MIN_T


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _tap_floats(k_up: int, k_down: int):
    ae, ao, oe, oo, de, do_, doe, doo = _polyphase_taps(k_up, k_down)
    assert (oe, oo, doe, doo) == (-3, -2, -2, -3), "kernel assumes k=12 geometry"
    assert len(ae) == len(ao) == len(de) == len(do_) == 6
    return (tuple(float(v) for v in ae), tuple(float(v) for v in ao),
            tuple(float(v) for v in de), tuple(float(v) for v in do_))


def _kernel(main_ref, halo_ref, a_ref, ib_ref, out_ref, *, taps, tt: int, t_real: int):
    """One (batch, channel-tile, time-tile) step.

    main/halo cover padded[b, cblk, t0 : t0+tt+128] (the kernel reads only the
    first 14 halo lanes) where padded has the input
    edge-replicated _PAD samples left. Local ext coordinate l maps to global
    output position pos = t0 - 3 + l for l in [0, tt+6).
    """
    ae, ao, de, do_ = taps
    ext = tt + 6
    x = jnp.concatenate([main_ref[0], halo_ref[0]], axis=-1).astype(jnp.float32)

    # up-phase FIRs: s_e[pos] needs x[pos-3 .. pos+2]  (x idx = padded - _PAD)
    #                s_o[pos] needs x[pos-2 .. pos+3]
    # padded-local idx of x[pos-3+m] = (pos - 3 + m) - (t0 - _PAD) = l + m + 2
    se = ae[0] * x[:, 2 : 2 + ext]
    for m in range(1, 6):
        se = se + ae[m] * x[:, 2 + m : 2 + m + ext]
    so = ao[0] * x[:, 3 : 3 + ext]
    for m in range(1, 6):
        so = so + ao[m] * x[:, 3 + m : 3 + m + ext]

    a = a_ref[:].astype(jnp.float32)
    ib = ib_ref[:].astype(jnp.float32)
    se = se + ib * jnp.square(jnp.sin(se * a))
    so = so + ib * jnp.square(jnp.sin(so * a))

    t0 = pl.program_id(2) * tt
    pos = t0 - 3 + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
    # downsample-input clamps: head -> s_e[0], tail -> s_o[T-1]
    first_e = jnp.sum(jnp.where(pos == 0, se, 0.0), axis=1, keepdims=True)
    last_o = jnp.sum(jnp.where(pos == t_real - 1, so, 0.0), axis=1, keepdims=True)
    head, tail = pos < 0, pos > t_real - 1
    e = jnp.where(head, first_e, jnp.where(tail, last_o, se))
    o = jnp.where(head, first_e, jnp.where(tail, last_o, so))

    # down-phase FIRs: out[pos] = sum_m de[m]*E[pos-2+m] + do[m]*O[pos-3+m]
    out = de[0] * e[:, 1 : 1 + tt] + do_[0] * o[:, 0:tt]
    for m in range(1, 6):
        out = out + de[m] * e[:, 1 + m : 1 + m + tt]
        out = out + do_[m] * o[:, m : m + tt]
    out_ref[0] = out.astype(out_ref.dtype)


def _pick_tiles(c: int, t: int) -> tuple[int, int]:
    """(C-tile, T-tile) under a ~10 MB VMEM working-set budget. Mosaic keeps
    roughly 16 block-sized f32 buffers live: 2x pipeline buffers for each of
    main/halo/out plus the in-kernel temps (x, se, so, e, o, out and select
    intermediates) — measured 14.2 block-equivalents at C=16."""
    c_tile = min(_round_up(c, 8), 128)
    budget = 10 * 1024 * 1024
    tt = budget // (16 * 4 * c_tile)
    tt = max(_LANE * 4, (tt // _LANE) * _LANE)
    tt = min(tt, _round_up(t, _LANE))
    return c_tile, tt


def snake_alias_cm_pallas(
    x: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    k_up: int = 12,
    k_down: int = 12,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused x2-up -> SnakeBeta -> x2-down on [B, C, T]; exact-edge semantics.

    Drop-in for ``snake_alias_fused_cm(x, alpha, beta, exact_edges=True)``.
    interpret=None auto-selects the Pallas interpreter off-TPU (tests).
    """
    taps = _tap_floats(k_up, k_down)
    b, c, t = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    c_tile, tt = _pick_tiles(c, t)
    cp = _round_up(c, c_tile)
    tp = _round_up(t, tt)
    nt = tp // tt
    halo = _LANE  # lane dim of a block must be a multiple of 128
    # padded: [B, Cp, _PAD + tp + (tt - _PAD)] = tp + tt total — divisible by
    # both tt (main blocks) and halo (halo blocks); edge-replicate on time so
    # the up-phase FIR windows of the first/last real samples see x[0]/x[T-1].
    padded = jnp.pad(x, ((0, 0), (0, 0), (_PAD, tp + tt - t - _PAD)), mode="edge")
    if cp != c:
        padded = jnp.pad(padded, ((0, 0), (0, cp - c), (0, 0)))

    af = jnp.exp(alpha.astype(jnp.float32)).reshape(-1, 1)
    ibf = 1.0 / (jnp.exp(beta.astype(jnp.float32)) + 1e-9).reshape(-1, 1)
    if cp != c:
        af = jnp.pad(af, ((0, cp - c), (0, 0)), constant_values=1.0)
        ibf = jnp.pad(ibf, ((0, cp - c), (0, 0)), constant_values=1.0)

    kernel = functools.partial(_kernel, taps=taps, tt=tt, t_real=t)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, cp, tp), x.dtype),
        grid=(b, cp // c_tile, nt),
        in_specs=[
            pl.BlockSpec((1, c_tile, tt), lambda bi, ci, ti: (bi, ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile, halo),
                         lambda bi, ci, ti: (bi, ci, (ti + 1) * (tt // halo)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, 1), lambda bi, ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, 1), lambda bi, ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_tile, tt), lambda bi, ci, ti: (bi, ci, ti),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded, padded, af, ibf)
    return out[:, :c, :t]
