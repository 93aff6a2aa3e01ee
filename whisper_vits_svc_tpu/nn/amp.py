"""AMP (Anti-aliased Multi-Periodicity) residual block.

Reference vits_decoder/bigv.py:19-64: per block, three dilated (1,3,5) and
three plain weight-norm convs, each preceded by an anti-aliased SnakeAlias
activation, combined residually.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from .conv import Conv1d
from .snake import SnakeAlias


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class AMPBlock(nn.Module):
    """layout="NCT" runs the whole block channel-major ([B, C, T], time in
    lanes) — measured 2.5-4.5x faster on the generator's small-channel tail
    stages (docs/PERFORMANCE.md). Params are layout-independent."""

    channels: int
    kernel_size: int = 3
    dilation: tuple[int, ...] = (1, 3, 5)
    snake_exact_edges: bool = True
    layout: str = "NTC"
    pallas_snake: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
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
