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

Two call paths:
- zero-copy (preferred): when C fits one channel block and T has a
  lane-aligned divisor tile, the kernel reads x in place. The +-8-sample tile
  halo comes from two extra BlockSpecs over the same x whose index_maps point
  at the neighboring 128-lane block (clamped at the array ends); the
  boundary tiles then rebuild the edge-replicated samples with masked
  selects. No jnp.pad of the input, no trim of the output — those were two
  extra full-tensor HBM passes per call.
- padded fallback (any shape): x is edge-padded so every block read is in
  bounds; the output is computed at tile-rounded length and trimmed.

Boundary semantics (exact parity with the reference's edge-replicate pads):
the up-phase FIRs read x through an edge-replicated pad, and the downsample
input s (the interleaved post-snake phases) is clamped as s[i<0] := s[0]
(even phase head) and s[i>2T-1] := s[2T-1] (odd phase tail). In-kernel that
is masked selects against the global position index, with the clamp values
recovered by masked reductions (position == 0 / == T-1) — no gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.snake import _polyphase_taps

_LANE = 128
_PAD = 8  # halo samples kept on each side of a tile (needs >= 6 left, 5 right)

# Shape gate (device-trace measured, v5e): the kernel is 3.6-4.6x faster than
# the jnp CM form on the narrow-channel long-time tail stages (C=10/T=320k:
# 2.25 -> 0.56 ms; C=20/T=160k: 2.24 -> 0.45 ms) and 1.75x at C=80/T=20k
# (0.33 -> 0.19 ms, padded path), but neutral at C=40/T=80k (0.33 vs 0.33)
# and 2x slower on short tensors (C=160/T=5k) where grid overhead dominates.
# XLA's CM fusion quality is erratic across these shapes; the gate is purely
# empirical per generator stage.
_MAX_C = 32
_MIN_T = 50_000

# ~10 MB VMEM working set; Mosaic keeps roughly 16 block-sized f32 buffers
# live (2x pipeline buffers for main/halo/out plus in-kernel temps — measured
# 14.2 block-equivalents at C=16).
_VMEM_BUDGET = 10 * 1024 * 1024


def use_pallas_for(c: int, t: int, b: int = 1) -> bool:
    """True where the kernel beats the jnp channel-major form (see above).

    The thresholds gate on total time-samples b*t: grid programs run
    sequentially on the single TensorCore, so a [8, C, 8000] training batch
    is the same work profile as [1, C, 64000] inference."""
    if c <= _MAX_C and b * t >= _MIN_T:
        return True
    # mid-channel stages (e.g. the generator's C=80 stage): pallas wins, but
    # C=40 / short-T shapes measured neutral-to-worse — leave those to XLA
    return 40 < c <= 128 and b * t >= 10_000


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _tap_floats(k_up: int, k_down: int):
    ae, ao, oe, oo, de, do_, doe, doo = _polyphase_taps(k_up, k_down)
    assert (oe, oo, doe, doo) == (-3, -2, -2, -3), "kernel assumes k=12 geometry"
    assert len(ae) == len(ao) == len(de) == len(do_) == 6
    return (tuple(float(v) for v in ae), tuple(float(v) for v in ao),
            tuple(float(v) for v in de), tuple(float(v) for v in do_))


def snake_range(x, x_lo: int, out_lo: int, out_len: int, a, ib, taps,
                t_real: int, t0):
    """Shared kernel math: SnakeAlias output over positions
    [t0+out_lo, t0+out_lo+out_len) from x (C, L) covering
    [t0+x_lo, t0+x_lo+L). x must span at least [out_lo-6, out_lo+out_len+6)
    with edge-replicate values already applied by the caller; the
    downsample-input clamps (s[i<0] := s[0], s[i>T-1] := s[T-1]) are applied
    here against the global position index."""
    ae, ao, de, do_ = taps
    ext = out_len + 6

    # up-phase FIRs on ext positions p = t0+out_lo-3+l, l in [0, ext):
    #   s_e[p] needs x[p-3 .. p+2], s_o[p] needs x[p-2 .. p+3]
    #   local idx of x[p-3+m] = (p-3+m) - (t0+x_lo) = l + m + (out_lo-6-x_lo)
    base = out_lo - 6 - x_lo
    se = ae[0] * x[:, base : base + ext]
    for m in range(1, 6):
        se = se + ae[m] * x[:, base + m : base + m + ext]
    so = ao[0] * x[:, base + 1 : base + 1 + ext]
    for m in range(1, 6):
        so = so + ao[m] * x[:, base + 1 + m : base + 1 + m + ext]

    se = se + ib * jnp.square(jnp.sin(se * a))
    so = so + ib * jnp.square(jnp.sin(so * a))

    pos = t0 + out_lo - 3 + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
    # downsample-input clamps: head -> s_e[0], tail -> s_o[T-1]
    first_e = jnp.sum(jnp.where(pos == 0, se, 0.0), axis=1, keepdims=True)
    last_o = jnp.sum(jnp.where(pos == t_real - 1, so, 0.0), axis=1, keepdims=True)
    head, tail = pos < 0, pos > t_real - 1
    e = jnp.where(head, first_e, jnp.where(tail, last_o, se))
    o = jnp.where(head, first_e, jnp.where(tail, last_o, so))

    # down-phase FIRs: out[pos] = sum_m de[m]*E[pos-2+m] + do[m]*O[pos-3+m]
    out = de[0] * e[:, 1 : 1 + out_len] + do_[0] * o[:, 0:out_len]
    for m in range(1, 6):
        out = out + de[m] * e[:, 1 + m : 1 + m + out_len]
        out = out + do_[m] * o[:, m : m + out_len]
    return out


def _kernel_strips(main_ref, halo_ref, offs_ref, a_ref, ib_ref, out_ref, *,
                   taps, tt: int, t_real: int):
    """Strip-folded variant of _kernel_padded: rows are (segment, channel)
    pairs of the original [C, T] array, so a c<8-multiple tensor runs at
    full (8, 128) VPU utilization (c=10 costs 2 sublane groups per tile in
    the plain layout — measured exactly 2x the c=8 cost, tools/diag_snake4).
    offs_ref [c_tile, 1] carries each row's global time offset; positions,
    boundary clamps and edge-replicate rebuilds all run against GLOBAL
    coordinates, so the result is bit-identical to the unfolded kernel
    (strip halos carry real neighbor samples; rows at the global ends carry
    the edge-replicated pad)."""
    x = jnp.concatenate(
        [main_ref[0], halo_ref[0][:, : 2 * _PAD]], axis=-1
    ).astype(jnp.float32)
    t0 = pl.program_id(2) * tt + offs_ref[:].astype(jnp.int32)  # [C, 1]
    out = snake_range(x, -_PAD, 0, tt, a_ref[:].astype(jnp.float32),
                      ib_ref[:].astype(jnp.float32), taps, t_real, t0)
    out_ref[0] = out.astype(out_ref.dtype)


def _strip_fold(c: int, t: int) -> int | None:
    """Best fold factor: rows become (fold*c) with segment length t/fold.
    Constraints: segments lane-aligned (t % (fold*128) == 0), fold*c <= 128;
    chosen to maximize sublane utilization fold*c / round8(fold*c). Returns
    None when the plain layout is already >= as good."""
    best, best_util = None, c / _round_up(c, 8)
    for fold in range(2, 128 // c + 1):
        if t % (fold * _LANE):
            continue
        cf = fold * c
        util = cf / _round_up(cf, 8)
        if util > best_util + 1e-9:
            best, best_util = fold, util
    return best


def _kernel_padded(main_ref, halo_ref, a_ref, ib_ref, out_ref, *, taps,
                   tt: int, t_real: int):
    """Padded path: main/halo cover padded[b, cblk, t0 : t0+tt+128] (only the
    first 2*_PAD halo lanes are read); padded = x edge-replicated _PAD left."""
    x = jnp.concatenate(
        [main_ref[0], halo_ref[0][:, : 2 * _PAD]], axis=-1
    ).astype(jnp.float32)
    t0 = pl.program_id(2) * tt
    out = snake_range(x, -_PAD, 0, tt, a_ref[:].astype(jnp.float32),
                      ib_ref[:].astype(jnp.float32), taps, t_real, t0)
    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_nocopy(main_ref, hl_ref, hr_ref, a_ref, ib_ref, out_ref, *, taps,
                   tt: int, t_real: int):
    """Zero-copy path: main covers x[t0 : t0+tt]; hl/hr are the neighboring
    128-lane blocks (index-clamped at the array ends). Edge replication for
    the first/last tiles is rebuilt with masked selects."""
    xl = hl_ref[0][:, _LANE - _PAD :]
    xr = hr_ref[0][:, :_PAD]
    x = jnp.concatenate([xl, main_ref[0], xr], axis=-1).astype(jnp.float32)

    t0 = pl.program_id(1) * tt
    px = t0 - _PAD + jax.lax.broadcasted_iota(jnp.int32, (1, tt + 2 * _PAD), 1)
    # boundary tiles: the clamped halo blocks hold wrong values outside
    # [0, T); replace with the edge-replicate values x[0] / x[T-1]
    x0 = jnp.sum(jnp.where(px == 0, x, 0.0), axis=1, keepdims=True)
    xn = jnp.sum(jnp.where(px == t_real - 1, x, 0.0), axis=1, keepdims=True)
    x = jnp.where(px < 0, x0, jnp.where(px > t_real - 1, xn, x))

    out = snake_range(x, -_PAD, 0, tt, a_ref[:].astype(jnp.float32),
                      ib_ref[:].astype(jnp.float32), taps, t_real, t0)
    out_ref[0] = out.astype(out_ref.dtype)


import os

# SVC_SNAKE_TILE_CAP bounds the zero-copy tile (in samples); the default
# budget-max tile measured SLOWER at long T (T=806k: tile 16128 -> 1.30 ms
# vs 8064 -> see tools/diag_snake.py sweep) because fewer, larger grid steps
# starve the Mosaic pipeline. None = budget-max (round-1 behavior).
_TILE_CAP = int(os.environ.get("SVC_SNAKE_TILE_CAP", "0")) or None


def _divisor_tile(c: int, t: int, cap: int | None = None) -> int | None:
    """Largest lane-aligned tile dividing t within the VMEM budget (and the
    optional cap), or None."""
    if t % _LANE:
        return None
    max_tt = _VMEM_BUDGET // (16 * 4 * max(c, 8))
    if cap or _TILE_CAP:
        max_tt = min(max_tt, cap or _TILE_CAP)
    g = t // _LANE
    best = 0
    for d in range(1, g + 1):
        if g % d == 0 and d * _LANE <= max_tt:
            best = max(best, d * _LANE)
    return best if best >= 4 * _LANE else None


# ------------------------------------------------------- MXU-FIR formulation
#
# The VPU form above spends most of its time on 24 lane-shifted
# multiply-accumulates (the four 6-tap phase FIRs) — at C=10/T=320k it runs
# ~0.52 ms against a ~0.1 ms HBM bound. FIR-as-matmul moves those MACs onto
# the (otherwise idle) MXU: gather x into per-128-lane-block windows
# (C*nblocks, 136) with two shifted slices + reshapes, then one banded
# constant matrix (136, 256) produces both up-phases for the whole block in
# a single matmul; the two down-phase FIRs likewise collapse into one
# (272, 128) matmul over stacked E/O windows. Only the snake nonlinearity
# and the boundary clamps remain on the VPU.

_W_UP = 136   # window width: 128 lanes + 6-tap reach, rounded to sublanes
_OFF = 64     # phase arrays are computed over [t0-_OFF, t0+tt+_OFF)


@functools.lru_cache(maxsize=None)
def _fir_matrices(k_up: int, k_down: int):
    """(B_up [136, 256], B_dn [272, 128]) banded constant FIR matrices."""
    import numpy as np

    ae, ao, de, do_ = _tap_floats(k_up, k_down)
    b_up = np.zeros((_W_UP, 2 * _LANE), np.float32)
    for r in range(_LANE):
        for m in range(6):
            # se[s+r] = sum_m ae[m] * x[s+r-3+m]; window[i] = x[s-3+i]
            b_up[r + m, r] = ae[m]
            # so[s+r] = sum_m ao[m] * x[s+r-2+m]
            b_up[r + m + 1, _LANE + r] = ao[m]
    b_dn = np.zeros((2 * _W_UP, _LANE), np.float32)
    for r in range(_LANE):
        for m in range(6):
            # out[s+r] = sum_m de[m]*E[s+r-2+m] + do[m]*O[s+r-3+m]
            # E window[i] = E[s-2+i], O window[i] = O[s-3+i]
            b_dn[r + m, r] = de[m]
            b_dn[_W_UP + r + m, r] = do_[m]
    return b_up, b_dn


def _windows(arr, start: int, nblk: int):
    """(C, L) -> (C*nblk, _W_UP) overlapping 128-stride windows
    window[j, i] = arr[:, start + 128*j + i]. arr must extend at least
    start + 128 + 128*nblk columns (tail beyond window col 8 is discarded)."""
    c = arr.shape[0]
    s1 = arr[:, start : start + nblk * _LANE].reshape(c, nblk, _LANE)
    s2 = arr[:, start + _LANE : start + _LANE + nblk * _LANE]
    s2 = s2.reshape(c, nblk, _LANE)[:, :, : _W_UP - _LANE]
    return jnp.concatenate([s1, s2], axis=-1).reshape(c * nblk, _W_UP)


def _kernel_nocopy_mxu(main_ref, hl_ref, hr_ref, bup_ref, bdn_ref, a_ref,
                       ib_ref, out_ref, *, tt: int, t_real: int):
    """MXU-FIR variant of _kernel_nocopy: full 128-lane halo blocks on both
    sides; phase signals computed over the 128-aligned range
    [t0-_OFF, t0+tt+_OFF) and consumed with static offsets."""
    c = main_ref.shape[1]
    xb = jnp.concatenate([hl_ref[0], main_ref[0], hr_ref[0]],
                         axis=-1).astype(jnp.float32)  # [t0-128, t0+tt+128)
    t0 = pl.program_id(1) * tt
    px = t0 - _LANE + jax.lax.broadcasted_iota(
        jnp.int32, (1, tt + 2 * _LANE), 1)
    x0 = jnp.sum(jnp.where(px == 0, xb, 0.0), axis=1, keepdims=True)
    xn = jnp.sum(jnp.where(px == t_real - 1, xb, 0.0), axis=1, keepdims=True)
    xb = jnp.where(px < 0, x0, jnp.where(px > t_real - 1, xn, xb))
    # slack so window slice2 stays in bounds (values discarded)
    xb = jnp.pad(xb, ((0, 0), (0, _LANE)))

    nbu = tt // _LANE + 1  # phase blocks over [t0-_OFF, t0+tt+_OFF)
    up = jax.lax.dot(
        _windows(xb, _LANE - _OFF - 3, nbu), bup_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(c, nbu, 2 * _LANE)
    se = up[:, :, :_LANE].reshape(c, nbu * _LANE)
    so = up[:, :, _LANE:].reshape(c, nbu * _LANE)

    a = a_ref[:].astype(jnp.float32)
    ib = ib_ref[:].astype(jnp.float32)
    se = se + ib * jnp.square(jnp.sin(se * a))
    so = so + ib * jnp.square(jnp.sin(so * a))

    pos = t0 - _OFF + jax.lax.broadcasted_iota(jnp.int32, (1, nbu * _LANE), 1)
    first_e = jnp.sum(jnp.where(pos == 0, se, 0.0), axis=1, keepdims=True)
    last_o = jnp.sum(jnp.where(pos == t_real - 1, so, 0.0), axis=1, keepdims=True)
    head, tail = pos < 0, pos > t_real - 1
    e = jnp.where(head, first_e, jnp.where(tail, last_o, se))
    o = jnp.where(head, first_e, jnp.where(tail, last_o, so))
    # slack for the down-window slice2
    e = jnp.pad(e, ((0, 0), (0, _LANE)))
    o = jnp.pad(o, ((0, 0), (0, _LANE)))

    nbd = tt // _LANE
    wins = jnp.concatenate(
        [_windows(e, _OFF - 2, nbd).reshape(c, nbd, _W_UP),
         _windows(o, _OFF - 3, nbd).reshape(c, nbd, _W_UP)], axis=-1)
    out = jax.lax.dot(
        wins.reshape(c * nbd, 2 * _W_UP), bdn_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(c, nbd * _LANE)
    out_ref[0] = out.astype(out_ref.dtype)


# ------------------------------------------------------------ backward kernel
#
# Analytic VJP of the fused chain in one VMEM pass. With y = D(s(U(x)))
# (U/D the polyphase up/down FIR pairs, s the snake nonlinearity):
#   dE/dO   = correlation of dy with the flipped down-phase taps
#   ds_e/o  = dE/dO masked to [0, T) + the extension clamps scattered onto
#             s_e[0] / s_o[T-1] (zero-padded dy makes out-of-range taps 0)
#   du_e/o  = ds * s'(u),  s'(u) = 1 + ib*a*sin(2au)   (u recomputed from x)
#   dx      = correlation of du with the flipped up-phase taps + the
#             edge-replicate pad adjoint onto x[0] / x[T-1]
#   dalpha  = a  * sum ds * ib * u * sin(2au)           (a = e^alpha)
#   dbeta   = -e^beta * ib^2 * sum ds * sin^2(au)       (ib = 1/(e^beta+eps))
# The per-channel dalpha/dbeta reductions accumulate across the grid into a
# revisited [C, 1] output block (grid is (channel, batch, time) so revisits
# are consecutive).


def _kernel_padded_bwd(mainx_ref, halox_ref, maindy_ref, halody_ref, a_ref,
                       ib_ref, eb_ref, dx_ref, da_ref, db_ref, *, taps,
                       tt: int, t_real: int):
    """Blocks cover padded[t0 : t0+tt+16) (x edge-padded, dy zero-padded by
    _PAD=8 on the left); outputs dx for [t0, t0+tt) plus accumulated
    dalpha/dbeta."""
    ae, ao, de, do_ = taps
    x = jnp.concatenate(
        [mainx_ref[0], halox_ref[0][:, : 2 * _PAD]], axis=-1
    ).astype(jnp.float32)                      # x[t0-8 .. t0+tt+8)
    dy = jnp.concatenate(
        [maindy_ref[0], halody_ref[0][:, : 2 * _PAD]], axis=-1
    ).astype(jnp.float32)                      # dy[t0-8 .. t0+tt+8), 0 outside [0,T)
    a = a_ref[:].astype(jnp.float32)
    ib = ib_ref[:].astype(jnp.float32)
    eb = eb_ref[:].astype(jnp.float32)
    t0 = pl.program_id(2) * tt

    ext = tt + 10                               # positions p in [t0-5, t0+tt+5)
    # pre-activations u_e[p] = sum_m ae[m] x[p-3+m]   (x local idx r+m)
    u_e = ae[0] * x[:, 0:ext]
    u_o = ao[0] * x[:, 1 : 1 + ext]
    for m in range(1, 6):
        u_e = u_e + ae[m] * x[:, m : m + ext]
        u_o = u_o + ao[m] * x[:, m + 1 : m + 1 + ext]
    # down-FIR adjoints dE[p] = sum_m de[m] dy[p+2-m], dO[p] = sum do dy[p+3-m]
    dE = de[0] * dy[:, 5 : 5 + ext]
    dO = do_[0] * dy[:, 6 : 6 + ext]
    for m in range(1, 6):
        dE = dE + de[m] * dy[:, 5 - m : 5 - m + ext]
        dO = dO + do_[m] * dy[:, 6 - m : 6 - m + ext]

    pos = t0 - 5 + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
    valid = (pos >= 0) & (pos <= t_real - 1)
    head = jnp.sum(jnp.where(pos < 0, dE + dO, 0.0), axis=1, keepdims=True)
    tail = jnp.sum(jnp.where(pos > t_real - 1, dE + dO, 0.0), axis=1,
                   keepdims=True)
    ds_e = jnp.where(valid, dE, 0.0) + jnp.where(pos == 0, head, 0.0)
    ds_o = jnp.where(valid, dO, 0.0) + jnp.where(pos == t_real - 1, tail, 0.0)

    sin2e, sin2o = jnp.sin(2.0 * a * u_e), jnp.sin(2.0 * a * u_o)
    du_e = ds_e * (1.0 + ib * a * sin2e)
    du_o = ds_o * (1.0 + ib * a * sin2o)

    # per-channel param grads, masked to this block's own positions
    own = valid & (pos >= t0) & (pos < t0 + tt)
    da_part = a * ib * jnp.sum(
        jnp.where(own, ds_e * u_e * sin2e + ds_o * u_o * sin2o, 0.0),
        axis=1, keepdims=True)
    se, so = jnp.sin(a * u_e), jnp.sin(a * u_o)
    db_part = -eb * ib * ib * jnp.sum(
        jnp.where(own, ds_e * se * se + ds_o * so * so, 0.0),
        axis=1, keepdims=True)

    # up-FIR adjoint over p' in [t0-3, t0+tt+3):
    #   dxp[p'] = sum_m ae[m] du_e[p'+3-m] + ao[m] du_o[p'+2-m]
    ext2 = tt + 6
    # du_ep: one zero appended (p = t0+tt+5, only read by unused/masked
    # positions); du_op: one zero prepended (p = t0-6, likewise)
    du_ep = jnp.pad(du_e, ((0, 0), (0, 1)))
    du_op = jnp.pad(du_o, ((0, 0), (1, 0)))
    dxp = ae[0] * du_ep[:, 5 : 5 + ext2] + ao[0] * du_op[:, 5 : 5 + ext2]
    for m in range(1, 6):
        dxp = dxp + ae[m] * du_ep[:, 5 - m : 5 - m + ext2]
        dxp = dxp + ao[m] * du_op[:, 5 - m : 5 - m + ext2]

    pos2 = t0 - 3 + jax.lax.broadcasted_iota(jnp.int32, (1, ext2), 1)
    head_x = jnp.sum(jnp.where(pos2 < 0, dxp, 0.0), axis=1, keepdims=True)
    tail_x = jnp.sum(jnp.where(pos2 > t_real - 1, dxp, 0.0), axis=1,
                     keepdims=True)
    po = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, tt), 1)
    dx = dxp[:, 3 : 3 + tt]
    dx = jnp.where(po > t_real - 1, 0.0, dx)
    dx = dx + jnp.where(po == 0, head_x, 0.0)
    dx = dx + jnp.where(po == t_real - 1, tail_x, 0.0)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # first visit of this channel block: grid is (channel, batch, time), so
    # each [C,1] accumulator block starts fresh at (bi=0, ti=0)
    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _init():
        da_ref[:] = jnp.zeros_like(da_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    da_ref[:] += da_part.astype(da_ref.dtype)
    db_ref[:] += db_part.astype(db_ref.dtype)


def snake_alias_cm_pallas_bwd(
    x: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    dy: jax.Array,
    k_up: int = 12,
    k_down: int = 12,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(dx, dalpha, dbeta) of snake_alias(x) for cotangent dy ([B, C, T])."""
    taps = _tap_floats(k_up, k_down)
    b, c, t = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    af = jnp.exp(alpha.astype(jnp.float32)).reshape(-1, 1)
    ebf = jnp.exp(beta.astype(jnp.float32)).reshape(-1, 1)
    ibf = 1.0 / (ebf + 1e-9)

    c_tile = min(_round_up(c, 8), 128)
    tt = _VMEM_BUDGET // (48 * 4 * c_tile)
    tt = max(_LANE * 4, (tt // _LANE) * _LANE)
    tt = min(tt, _round_up(t, _LANE))
    cp = _round_up(c, c_tile)
    tp = _round_up(t, tt)
    nt = tp // tt
    pads = ((0, 0), (0, cp - c), (_PAD, tp + tt - t - _PAD))
    xpad = jnp.pad(jnp.pad(x, ((0, 0), (0, 0), (_PAD, tp + tt - t - _PAD)),
                           mode="edge"), ((0, 0), (0, cp - c), (0, 0)))
    dypad = jnp.pad(dy, pads)
    if cp != c:
        af = jnp.pad(af, ((0, cp - c), (0, 0)), constant_values=1.0)
        ibf = jnp.pad(ibf, ((0, cp - c), (0, 0)), constant_values=1.0)
        ebf = jnp.pad(ebf, ((0, cp - c), (0, 0)), constant_values=1.0)

    main_spec = pl.BlockSpec((1, c_tile, tt), lambda ci, bi, ti: (bi, ci, ti),
                             memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(
        (1, c_tile, _LANE),
        lambda ci, bi, ti: (bi, ci, (ti + 1) * (tt // _LANE)),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((c_tile, 1), lambda ci, bi, ti: (ci, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_padded_bwd, taps=taps, tt=tt, t_real=t)
    dxp, da, db = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, cp, tp), x.dtype),
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
        ),
        grid=(cp // c_tile, b, nt),
        in_specs=[main_spec, halo_spec, main_spec, halo_spec,
                  vec_spec, vec_spec, vec_spec],
        out_specs=(main_spec, vec_spec, vec_spec),
        interpret=interpret,
    )(xpad, xpad, dypad, dypad, af, ibf, ebf)
    return (dxp[:, :c, :t],
            da[:c, 0].astype(alpha.dtype), db[:c, 0].astype(beta.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def snake_alias_cm_pallas_diff(x, alpha, beta, k_up: int = 12,
                               k_down: int = 12):
    """Differentiable wrapper: Pallas kernels both directions.

    Forward runs the fused single-VMEM-pass kernel; backward runs the
    analytic VJP kernel (``snake_alias_cm_pallas_bwd`` — dx, dalpha, dbeta in
    one pass, recomputing u from the saved x) on TPU, or ``jax.vjp`` of the
    numerically-identical jnp channel-major form elsewhere. Either way only
    x is held between passes instead of the 4+ T-sized phase intermediates
    XLA's default AD would save per activation — a net HBM win for the 91
    snake applications per generator step. Gradients equal the jnp path's to
    float tolerance (test_snake_fused.py gradient parity).
    """
    return snake_alias_cm_pallas(x, alpha, beta, k_up, k_down)


def _diff_fwd(x, alpha, beta, k_up, k_down):
    return snake_alias_cm_pallas_diff(x, alpha, beta, k_up, k_down), (
        x, alpha, beta)


def _diff_bwd(k_up, k_down, res, dy):
    x, alpha, beta = res
    if jax.default_backend() == "tpu":
        return snake_alias_cm_pallas_bwd(x, alpha, beta, dy, k_up, k_down)

    from ..nn.snake import snake_alias_fused_cm

    _, vjp = jax.vjp(
        lambda x_, a_, b_: snake_alias_fused_cm(
            x_, a_, b_, k_up, k_down, exact_edges=True),
        x, alpha, beta,
    )
    return vjp(dy)


snake_alias_cm_pallas_diff.defvjp(_diff_fwd, _diff_bwd)


def _snake_strips(x, af, ibf, taps, fold: int, t_real: int, interpret: bool):
    """Strip-folded launch: [b, c, t] -> fold x (t/fold)-segments stacked on
    the channel axis -> _kernel_strips at full sublane utilization -> unfold.
    Bit-identical to the plain kernel (global-coordinate clamps; halos carry
    real neighbors / edge replicas). Costs one gather pass in and one
    transpose pass out — a net win only at long T (see use gate)."""
    import numpy as _np

    b, c, t = x.shape
    seg = t // fold
    cf = c * fold
    xp = jnp.pad(x, ((0, 0), (0, 0), (_PAD, _PAD)), mode="edge")
    rows = [jax.lax.dynamic_slice_in_dim(xp, f * seg, seg + 2 * _PAD, 2)
            for f in range(fold)]
    folded = jnp.concatenate(rows, axis=1)  # [b, cf, seg + 2*_PAD], f-major

    c_tile = min(_round_up(cf, 8), 128)
    tt = _VMEM_BUDGET // (16 * 4 * c_tile)
    tt = max(_LANE * 4, (tt // _LANE) * _LANE)
    tt = min(tt, _round_up(seg, _LANE))
    cp = _round_up(cf, c_tile)
    tp = _round_up(seg, tt)
    nt = tp // tt
    folded = jnp.pad(folded, ((0, 0), (0, cp - cf),
                              (0, tp + tt - seg - 2 * _PAD)))
    offs = jnp.asarray(
        _np.pad(_np.repeat(_np.arange(fold) * seg, c), (0, cp - cf))
        .reshape(-1, 1), jnp.int32)
    af_f = jnp.pad(jnp.tile(af, (fold, 1)), ((0, cp - cf), (0, 0)),
                   constant_values=1.0)
    ibf_f = jnp.pad(jnp.tile(ibf, (fold, 1)), ((0, cp - cf), (0, 0)),
                    constant_values=1.0)

    main_spec = pl.BlockSpec((1, c_tile, tt), lambda bi, ci, ti: (bi, ci, ti),
                             memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec(
        (1, c_tile, _LANE),
        lambda bi, ci, ti: (bi, ci, (ti + 1) * (tt // _LANE)),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((c_tile, 1), lambda bi, ci, ti: (ci, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_strips, taps=taps, tt=tt,
                               t_real=t_real)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, cp, tp), x.dtype),
        grid=(b, cp // c_tile, nt),
        in_specs=[main_spec, halo_spec, vec_spec, vec_spec, vec_spec],
        out_specs=main_spec,
        interpret=interpret,
    )(folded, folded, offs, af_f, ibf_f)
    return (out[:, :cf, :seg]
            .reshape(b, fold, c, seg)
            .transpose(0, 2, 1, 3)
            .reshape(b, c, t))


def snake_alias_cm_pallas(
    x: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    k_up: int = 12,
    k_down: int = 12,
    interpret: bool | None = None,
    mxu: bool = False,
    tile_cap: int | None = None,
    strips: bool | None = None,
) -> jax.Array:
    """Fused x2-up -> SnakeBeta -> x2-down on [B, C, T]; exact-edge semantics.

    Drop-in for ``snake_alias_fused_cm(x, alpha, beta, exact_edges=True)``.
    interpret=None auto-selects the Pallas interpreter off-TPU (tests).
    mxu=True runs the phase FIRs as banded matmuls on the MXU (zero-copy
    path only). Measured SLOWER than the VPU shifted-MAC form on v5e
    (0.69 vs 0.56 ms at C=10/T=320k; 0.66 vs 0.45 at C=20/T=160k) — the
    window-gather relayouts cost more than the MACs they offload — so the
    default stays on the VPU form; kept for other hardware generations.
    """
    taps = _tap_floats(k_up, k_down)
    b, c, t = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    af = jnp.exp(alpha.astype(jnp.float32)).reshape(-1, 1)
    ibf = 1.0 / (jnp.exp(beta.astype(jnp.float32)) + 1e-9).reshape(-1, 1)

    # strip-folded path: kernel cost is ceil(c/8) sublane groups x T
    # (measured: c=10 costs exactly 2x c=8 at equal T — diag_snake4), so
    # non-8-multiple channel counts at long T can fold time segments onto
    # the channel axis for full utilization. Standalone this wins 23-35%
    # (c=10/T=806k: 1.40 -> 1.08 ms single-call), but IN-GRAPH the fold
    # gather + unfold transpose around every call break XLA's fusion chains
    # and the full decoder measures 16% SLOWER (same-session A/B, 401.3 vs
    # 464.9 ms per 50 s at the shipped geometry — docs/PERFORMANCE.md
    # round-5 section; the same standalone-vs-in-graph reversal as the
    # fused-AMP and stride-fold probes). Default OFF; SVC_SNAKE_STRIPS=1
    # re-enables for standalone/experimental use.
    if strips is None:
        strips = (c % 8 != 0 and b * t >= 2 * _MIN_T and t % _LANE == 0
                  and os.environ.get("SVC_SNAKE_STRIPS", "0") == "1")
    if strips and not mxu:
        fold = _strip_fold(c, t)
        if fold is not None:
            return _snake_strips(x, af, ibf, taps, fold, t, interpret)

    tt_div = _divisor_tile(c, t, tile_cap) if c <= 128 else None
    if tt_div is not None:
        tt = tt_div
        nt = t // tt
        nb = tt // _LANE
        last = t // _LANE - 1
        main_spec = pl.BlockSpec((1, c, tt), lambda bi, ti: (bi, 0, ti),
                                 memory_space=pltpu.VMEM)
        hl_spec = pl.BlockSpec(
            (1, c, _LANE),
            lambda bi, ti: (bi, 0, jnp.maximum(ti * nb - 1, 0)),
            memory_space=pltpu.VMEM)
        hr_spec = pl.BlockSpec(
            (1, c, _LANE),
            lambda bi, ti: (bi, 0, jnp.minimum((ti + 1) * nb, last)),
            memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((c, 1), lambda bi, ti: (0, 0),
                                memory_space=pltpu.VMEM)
        if mxu:
            b_up, b_dn = _fir_matrices(k_up, k_down)
            kernel = functools.partial(_kernel_nocopy_mxu, tt=tt, t_real=t)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((b, c, t), x.dtype),
                grid=(b, nt),
                in_specs=[
                    main_spec, hl_spec, hr_spec,
                    pl.BlockSpec((_W_UP, 2 * _LANE), lambda bi, ti: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2 * _W_UP, _LANE), lambda bi, ti: (0, 0),
                                 memory_space=pltpu.VMEM),
                    vec_spec, vec_spec,
                ],
                out_specs=main_spec,
                interpret=interpret,
            )(x, x, x, jnp.asarray(b_up), jnp.asarray(b_dn), af, ibf)
        kernel = functools.partial(_kernel_nocopy, taps=taps, tt=tt, t_real=t)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, c, t), x.dtype),
            grid=(b, nt),
            in_specs=[main_spec, hl_spec, hr_spec, vec_spec, vec_spec],
            out_specs=main_spec,
            interpret=interpret,
        )(x, x, x, af, ibf)

    # ------------------------------------------------- padded fallback path
    c_tile = min(_round_up(c, 8), 128)
    tt = _VMEM_BUDGET // (16 * 4 * c_tile)
    tt = max(_LANE * 4, (tt // _LANE) * _LANE)
    tt = min(tt, _round_up(t, _LANE))
    cp = _round_up(c, c_tile)
    tp = _round_up(t, tt)
    nt = tp // tt
    # padded: [B, Cp, _PAD + tp + (tt - _PAD)] = tp + tt total — divisible by
    # both tt (main blocks) and 128 (halo blocks); edge-replicate on time so
    # the up-phase FIR windows of the first/last real samples see x[0]/x[T-1].
    padded = jnp.pad(x, ((0, 0), (0, 0), (_PAD, tp + tt - t - _PAD)), mode="edge")
    if cp != c:
        padded = jnp.pad(padded, ((0, 0), (0, cp - c), (0, 0)))
        af = jnp.pad(af, ((0, cp - c), (0, 0)), constant_values=1.0)
        ibf = jnp.pad(ibf, ((0, cp - c), (0, 0)), constant_values=1.0)

    kernel = functools.partial(_kernel_padded, taps=taps, tt=tt, t_real=t)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, cp, tp), x.dtype),
        grid=(b, cp // c_tile, nt),
        in_specs=[
            pl.BlockSpec((1, c_tile, tt), lambda bi, ci, ti: (bi, ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile, _LANE),
                         lambda bi, ci, ti: (bi, ci, (ti + 1) * (tt // _LANE)),
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
