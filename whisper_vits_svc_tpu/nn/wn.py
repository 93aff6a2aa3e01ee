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

from .conv import Conv1d, _torch_conv_init, _wn_kernel


def gated_activation(x_in: jax.Array, g_l: jax.Array, channels: int) -> jax.Array:
    acts = x_in + g_l
    return jnp.tanh(acts[..., :channels]) * jax.nn.sigmoid(acts[..., channels:])


class _ConvWNParams(nn.Module):
    """Parameter-only twin of Conv1d(weight_norm=True): same names (v/g/bias),
    shapes, and initializers under the same module path, so checkpoints are
    interchangeable with the module-composed layer loop. Used by WN's scanned
    stack, which consumes the raw per-layer arrays stacked along a leading
    layer axis."""

    kernel_size: int
    in_ch: int
    features: int

    @nn.compact
    def __call__(self):
        kshape = (self.kernel_size, self.in_ch, self.features)
        fan_in = self.in_ch * self.kernel_size
        v = self.param("v", _torch_conv_init(fan_in), kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)
            ).reshape(shape),
            (1, 1, self.features),
        )
        bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
        return v, g, bias


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

        if (self.dilation_rate == 1 and self.n_layers >= 3
                and self.p_dropout == 0.0):
            return self._scan_stack(x, x_mask, g)

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

    def _scan_stack(self, x, x_mask, g):
        """lax.scan over layers 0..n-2 (identical shapes at dilation 1; the
        last layer differs — res_skip is h-wide, not 2h) with per-layer params
        stacked at trace time. One compiled layer body instead of n_layers
        unrolled copies: the 16-layer posterior + 8 coupling WN instances were
        the largest single contributor to XLA graph size in the train step
        (compile-time, not runtime — layers are sequential either way).
        Param tree and arithmetic are identical to the unrolled loop.

        On TPU the scan is fully UNROLLED (lax.scan(unroll=...)): above
        ~2000-frame inputs XLA stops unrolling the while itself, and the
        non-unrolled loop body blocks fusion — the flow's WN stacks went
        0.16 ms -> 48 ms of `while` + 30 ms of dynamic-update-slice in the
        2520-frame shipped chunk (round-4 trace). Unrolling restores
        straight-line convs; CPU keeps the rolled scan for the 3x
        compile-time cut this stack was introduced for."""
        h = self.hidden_channels
        n = self.n_layers
        pad = (self.kernel_size - 1) // 2
        dn = ("NHC", "HIO", "NHC")

        ins = [_ConvWNParams(self.kernel_size, h, 2 * h, name=f"in_layers_{i}")()
               for i in range(n)]
        rss = [_ConvWNParams(1, h, 2 * h if i < n - 1 else h,
                             name=f"res_skip_layers_{i}")()
               for i in range(n)]
        stack = lambda seq: jax.tree.map(lambda *a: jnp.stack(a), *seq)
        iv, ig, ib = stack(ins[:-1])
        rv, rg, rb = stack(rss[:-1])
        if g is not None:
            b, tg = g.shape[0], g.shape[1]
            g_l = g.reshape(b, tg, n, 2 * h).transpose(2, 0, 1, 3)
        else:
            g_l = jnp.zeros((n, 1, 1, 2 * h), x.dtype)

        def body(carry, per):
            x, out = carry
            (v_i, g_i, b_i), (v_r, g_r, b_r), gl = per
            x_in = jax.lax.conv_general_dilated(
                x, _wn_kernel(v_i, g_i, (0, 1)).astype(x.dtype), (1,),
                [(pad, pad)], dimension_numbers=dn) + b_i.astype(x.dtype)
            acts = gated_activation(x_in, gl, h)
            res_skip = jax.lax.conv_general_dilated(
                acts, _wn_kernel(v_r, g_r, (0, 1)).astype(x.dtype), (1,),
                [(0, 0)], dimension_numbers=dn) + b_r.astype(x.dtype)
            x = (x + res_skip[..., :h]) * x_mask
            out = out + res_skip[..., h:]
            return (x, out), None

        (x, output), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x)),
            ((iv, ig, ib), (rv, rg, rb), g_l[:-1]),
            unroll=jax.default_backend() == "tpu")

        v_i, g_i, b_i = ins[-1]
        x_in = jax.lax.conv_general_dilated(
            x, _wn_kernel(v_i, g_i, (0, 1)).astype(x.dtype), (1,),
            [(pad, pad)], dimension_numbers=dn) + b_i.astype(x.dtype)
        acts = gated_activation(x_in, g_l[-1], h)
        v_r, g_r, b_r = rss[-1]
        res_skip = jax.lax.conv_general_dilated(
            acts, _wn_kernel(v_r, g_r, (0, 1)).astype(x.dtype), (1,),
            [(0, 0)], dimension_numbers=dn) + b_r.astype(x.dtype)
        return (output + res_skip) * x_mask
