"""AMP (Anti-aliased Multi-Periodicity) residual block.

Reference vits_decoder/bigv.py:19-64: per block, three dilated (1,3,5) and
three plain weight-norm convs, each preceded by an anti-aliased SnakeAlias
activation, combined residually.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from .conv import Conv1d, declare_nct_wn_conv
from .snake import SnakeAlias, _ActParams


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class _SnakeParams(nn.Module):
    """Param holder matching SnakeAlias's tree (<name>/act/{alpha,beta})."""

    channels: int

    @nn.compact
    def __call__(self):
        return _ActParams(self.channels, name="act")()


class _ConvParams(nn.Module):
    """Param holder matching Conv1d(NCT, weight_norm) — returns folded w, b."""

    kernel_size: int
    in_ch: int
    features: int

    @nn.compact
    def __call__(self):
        return declare_nct_wn_conv(self, self.kernel_size, self.in_ch,
                                   self.features)


class AMPBlock(nn.Module):
    """layout="NCT" runs the whole block channel-major ([B, C, T], time in
    lanes) — measured 2.5-4.5x faster on the generator's small-channel tail
    stages (docs/PERFORMANCE.md). Params are layout-independent.

    pallas_fused_iter=True additionally fuses each whole dilation iteration
    (act -> conv -> act -> conv -> residual) into one Pallas kernel
    (ops/pallas_amp.py); the param tree is unchanged, so checkpoints are
    interchangeable with the unfused paths. Off by default: in-graph it
    measured NET NEGATIVE (42.2 -> 47.6 ms/chunk device) — the synthesis
    graph is VPU-bound on the snake FIRs, not HBM-bound, so the saved passes
    don't pay for the fused kernel's widened intermediate ranges. Kept as
    groundwork for an MXU-FIR formulation."""

    channels: int
    kernel_size: int = 3
    dilation: tuple[int, ...] = (1, 3, 5)
    snake_exact_edges: bool = True
    layout: str = "NTC"
    pallas_snake: bool = False
    pallas_fused_iter: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (self.layout == "NCT" and self.pallas_fused_iter
                and self.snake_exact_edges):
            from ..ops import pallas_amp

            if pallas_amp.use_fused_iter(x.shape[1], x.shape[2], x.shape[0]):
                c = self.channels
                for j, d in enumerate(self.dilation):
                    a1, be1 = _SnakeParams(c, name=f"act1_{j}")()
                    k1, b1 = _ConvParams(self.kernel_size, c, c,
                                         name=f"convs1_{j}")()
                    a2, be2 = _SnakeParams(c, name=f"act2_{j}")()
                    k2, b2 = _ConvParams(self.kernel_size, c, c,
                                         name=f"convs2_{j}")()
                    x = pallas_amp.amp_iter(x, k1, b1, a1, be1, k2, b2, a2,
                                            be2, self.kernel_size, d)
                return x

        for j, d in enumerate(self.dilation):
            xt = SnakeAlias(self.channels, exact_edges=self.snake_exact_edges,
                            layout=self.layout, use_pallas=self.pallas_snake,
                            name=f"act1_{j}")(x)
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=_get_padding(self.kernel_size, d),
                weight_norm=True,
                layout=self.layout,
                name=f"convs1_{j}",
            )(xt)
            xt = SnakeAlias(self.channels, exact_edges=self.snake_exact_edges,
                            layout=self.layout, use_pallas=self.pallas_snake,
                            name=f"act2_{j}")(xt)
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=_get_padding(self.kernel_size, 1),
                weight_norm=True,
                layout=self.layout,
                name=f"convs2_{j}",
            )(xt)
            x = xt + x
        return x
