"""NSF-BigVGAN generator (the SVC vocoder/decoder).

Re-designs reference vits_decoder/generator.py:15-200 for TPU: latent
perturbation (train only), SpeakerAdapter conditional layernorm, Mish-gated
pre-conv, five weight-norm ConvTranspose1d upsample stages (x5*4*4*2*2 = x320)
each followed by additive NSF harmonic-source injection (strided noise_convs
on the merged excitation) and three averaged AMPBlocks, then an anti-aliased
snake post-activation and a bias-free k=7 projection to waveform.

The harmonic source itself comes from ops-level `source_hn_nsf` (frame-rate F0
in, sample-rate excitation out) — see nn/nsf.py for the TPU-native phase
computation replacing the reference's full-length cumsum.

Layout: latents [B, T, C]; audio [B, T_samples, 1].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.amp import AMPBlock
from ..nn.conv import Conv1d, ConvTranspose1d, Dense
from ..nn.nsf import source_hn_nsf
from ..nn.snake import SnakeAlias


class SpeakerAdapter(nn.Module):
    """Speaker-conditional layer norm (reference generator.py:15-47).

    Per-timestep channel normalization, scale/bias predicted from the speaker
    embedding; W_scale init (0 weight, 1 bias), W_bias init (0, 0).
    """

    adapter_dim: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, speaker: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        w_scale = self.param("w_scale_kernel", nn.initializers.zeros,
                             (speaker.shape[-1], self.adapter_dim))
        b_scale = self.param("w_scale_bias", nn.initializers.ones, (self.adapter_dim,))
        w_bias = self.param("w_bias_kernel", nn.initializers.zeros,
                            (speaker.shape[-1], self.adapter_dim))
        b_bias = self.param("w_bias_bias", nn.initializers.zeros, (self.adapter_dim,))
        scale = speaker @ w_scale + b_scale
        bias = speaker @ w_bias + b_bias
        return y * scale[:, None, :] + bias[:, None, :]


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class Generator(nn.Module):
    """hp.gen/hp.vits/hp.data sections drive the architecture (configs/base.yaml)."""

    upsample_input: int = 192
    upsample_initial_channel: int = 320
    upsample_rates: tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (15, 8, 8, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    spk_dim: int = 256
    sampling_rate: int = 32000
    snake_exact_edges: bool = True
    # Run the AMP stages (and the post activation/projection) channel-major
    # ([B, C, T], time in lanes): xprof traces showed XLA layout copies around
    # the small-channel NHC convs dominating the tail stages; the CM forms are
    # 2.5-4.5x faster there and f32-exact (docs/PERFORMANCE.md). Upsamplers and
    # noise_convs stay NHC; one transpose pair per stage at the boundary.
    channel_major_amp: bool = True
    # Single-pass Pallas SnakeAlias kernel (forward-only -> inference graphs).
    pallas_snake: bool = False

    @property
    def hop(self) -> int:
        return int(math.prod(self.upsample_rates))

    def pitch2source(self, f0_frames: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        """Frame F0 [B, T] -> whole-utterance excitation [B, T*hop, 1].

        Reference Generator.pitch2source (generator.py:160-165); computed once
        per utterance so chunked synthesis keeps phase continuity
        (svc_inference.py:90,123-124).
        """
        return source_hn_nsf(f0_frames, self.hop, self.sampling_rate, rng)

    @nn.compact
    def __call__(
        self,
        spk: jax.Array,
        x: jax.Array,
        f0_frames: jax.Array | None = None,
        har_source: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        """spk [B, spk_dim]; x [B, T, C] latent; either frame F0 or a
        precomputed har_source [B, T*hop, 1]. Returns audio [B, T*hop, 1]."""
        num_kernels = len(self.resblock_kernel_sizes)
        if train:
            # +1 sigma latent perturbation, train fwd only (generator.py:116)
            x = x + jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
        x = SpeakerAdapter(self.upsample_input, name="adapter")(x, spk)
        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        x = mish(x)

        if har_source is None:
            rng = self.make_rng("noise") if train else None
            har_source = source_hn_nsf(f0_frames, self.hop, self.sampling_rate, rng)

        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2, weight_norm=True,
                name=f"ups_{i}",
            )(x)
            # NSF excitation injection, strided down to this stage's rate
            if i + 1 < len(self.upsample_rates):
                stride_f0 = int(math.prod(self.upsample_rates[i + 1 :]))
                x_source = Conv1d(
                    ch, stride_f0 * 2, stride=stride_f0, padding=stride_f0 // 2,
                    name=f"noise_convs_{i}",
                )(har_source)
            else:
                x_source = Conv1d(ch, 1, name=f"noise_convs_{i}")(har_source)
            x = x + x_source
            last = i + 1 == len(self.upsample_rates)
            layout = "NCT" if self.channel_major_amp else "NTC"
            if self.channel_major_amp:
                x = x.transpose(0, 2, 1)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                block = AMPBlock(ch, rk, tuple(rd),
                                 snake_exact_edges=self.snake_exact_edges,
                                 layout=layout, pallas_snake=self.pallas_snake,
                                 name=f"resblocks_{i * num_kernels + j}")
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels
            if self.channel_major_amp and not last:
                x = x.transpose(0, 2, 1)

        # post activation + projection stay in the AMP layout; for NCT the
        # final transpose is on [B, 1, T] (a free reshape)
        layout = "NCT" if self.channel_major_amp else "NTC"
        x = SnakeAlias(ch, exact_edges=self.snake_exact_edges,
                       layout=layout, use_pallas=self.pallas_snake,
                       name="activation_post")(x)
        x = Conv1d(1, 7, padding=3, use_bias=False, layout=layout,
                   name="conv_post")(x)
        if self.channel_major_amp:
            x = x.reshape(x.shape[0], x.shape[2], 1)
        return jnp.tanh(x)
