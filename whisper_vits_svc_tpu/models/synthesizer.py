"""VITS core: prior/posterior encoders, SNAC flow, full synthesizer graphs.

TPU-native re-design of reference vits/models.py:14-256. Everything is a pure
flax apply; randomness (prior/posterior sampling, feature perturbation, random
segment slice, decoder latent noise) flows through named rng streams so a
jitted training step is fully reproducible. Layout is [B, T, C] channels-last;
all shapes static (lengths carried as masks).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import RelPosTransformer
from ..nn.conv import Conv1d, Dense
from ..nn.flow import ResidualCouplingBlock
from ..nn.grl import SpeakerClassifier
from ..nn.wn import WN
from ..utils.pitch import f0_to_coarse
from .generator import Generator


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] lengths -> [B, T, 1] float mask (reference commons.sequence_mask:147)."""
    idx = jnp.arange(max_length)[None, :]
    return (idx < lengths[:, None]).astype(jnp.float32)[..., None]


class TextEncoder(nn.Module):
    """PPG + content-vec + quantized-F0 prior encoder (vits/models.py:14-52)."""

    in_channels: int = 1280
    vec_channels: int = 256
    out_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 640
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, ppg, lengths, vec, f0_coarse, train: bool = False,
                 noise_scale: float = 1.0):
        """ppg [B,T,1280], vec [B,T,256], f0_coarse [B,T] int -> (z, m, logs, mask, x).

        noise_scale scales the prior sample temperature (1.0 == reference
        models.py:51; 0.0 gives the deterministic mean path).
        """
        x_mask = sequence_mask(lengths, ppg.shape[1]).astype(ppg.dtype)
        x = Conv1d(self.hidden_channels, 5, padding=2, name="pre")(ppg) * x_mask
        v = Conv1d(self.hidden_channels, 5, padding=2, name="hub")(vec) * x_mask
        pit_emb = nn.Embed(256, self.hidden_channels, name="pit",
                           embedding_init=nn.initializers.normal(1.0))
        x = x + v + pit_emb(f0_coarse)
        x = RelPosTransformer(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers, self.kernel_size, self.p_dropout, name="enc",
        )(x * x_mask, x_mask, deterministic=not train)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        noise = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
        z = (m + noise * jnp.exp(logs) * noise_scale) * x_mask
        return z, m, logs, x_mask, x


class PosteriorEncoder(nn.Module):
    """Linear-spectrogram posterior, 16-layer gin-conditioned WN (models.py:101-136)."""

    out_channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 256

    @nn.compact
    def __call__(self, spec, lengths, g, noise_scale: float = 1.0):
        """spec [B,T,513], g [B,gin] -> (z, m, logs, mask)."""
        x_mask = sequence_mask(lengths, spec.shape[1]).astype(spec.dtype)
        x = Conv1d(self.hidden_channels, 1, name="pre")(spec) * x_mask
        x = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.n_layers, gin_channels=self.gin_channels, name="enc",
        )(x, x_mask, g=g[:, None, :])
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        noise = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
        z = (m + noise * jnp.exp(logs) * noise_scale) * x_mask
        return z, m, logs, x_mask


def rand_slice_segments_with_pitch(rng, z, pitch, lengths, segment_size,
                                   ids=None):
    """Random aligned (z, pitch) slice per batch item (commons.py:8-26).

    Static output shapes: [B, segment_size, C] and [B, segment_size].
    `ids` overrides the random offsets (deterministic tests).
    """
    b = z.shape[0]
    if ids is None:
        ids_str_max = (lengths - segment_size + 1).astype(jnp.float32)
        ids = (jax.random.uniform(rng, (b,)) * ids_str_max).astype(jnp.int32)

    def slice_one(zi, pi, idx):
        zs = jax.lax.dynamic_slice_in_dim(zi, idx, segment_size, axis=0)
        ps = jax.lax.dynamic_slice_in_dim(pi, idx, segment_size, axis=0)
        return zs, ps

    z_slice, pit_slice = jax.vmap(slice_one)(z, pitch, ids)
    return z_slice, pit_slice, ids


def slice_segments(x, ids, segment_size):
    """[B, T, ...] -> [B, segment_size, ...] at per-item offsets (commons.py:74-81)."""

    def slice_one(xi, idx):
        return jax.lax.dynamic_slice_in_dim(xi, idx, segment_size, axis=0)

    return jax.vmap(slice_one)(x, ids)


class TrainOutputs(NamedTuple):
    fake_audio: jax.Array    # [B, segment*hop, 1]
    ids_slice: jax.Array     # [B]
    spec_mask: jax.Array     # [B, T, 1]
    z_f: jax.Array
    z_r: jax.Array
    z_p: jax.Array
    m_p: jax.Array
    logs_p: jax.Array
    z_q: jax.Array
    m_q: jax.Array
    logs_q: jax.Array
    logdet_f: jax.Array
    logdet_r: jax.Array
    spk_preds: jax.Array


class SynthesizerTrn(nn.Module):
    """Training graph (reference vits/models.py:139-208)."""

    spec_channels: int = 513
    segment_size: int = 25       # frames (segment_samples // hop)
    ppg_dim: int = 1280
    vec_dim: int = 256
    spk_dim: int = 256
    gin_channels: int = 256
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 640
    upsample_rates: tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (15, 8, 8, 4, 4)
    upsample_initial_channel: int = 320
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    sampling_rate: int = 32000
    # structural depth knobs (defaults == reference vits/models.py:149-177;
    # shrunk only by the micro test config, utils/testing.py::micro_hp)
    enc_p_layers: int = 6
    enc_q_layers: int = 16
    flow_wn_layers: int = 4
    n_flows: int = 4
    # Pallas SnakeAlias in the decoder (differentiable via
    # snake_alias_cm_pallas_diff); the per-shape gate still decides which
    # stages actually take the kernel.
    pallas_snake: bool = False

    def setup(self):
        self.emb_g = Dense(self.gin_channels, name="emb_g")
        self.enc_p = TextEncoder(
            self.ppg_dim, self.vec_dim, self.inter_channels, self.hidden_channels,
            self.filter_channels, 2, self.enc_p_layers, 3, 0.1, name="enc_p",
        )
        self.speaker_classifier = SpeakerClassifier(
            self.hidden_channels, self.spk_dim, name="speaker_classifier"
        )
        self.enc_q = PosteriorEncoder(
            self.inter_channels, self.hidden_channels, 5, 1, self.enc_q_layers,
            gin_channels=self.gin_channels, name="enc_q",
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1, self.flow_wn_layers,
            n_flows=self.n_flows, gin_channels=self.spk_dim, name="flow",
        )
        self.dec = Generator(
            upsample_input=self.inter_channels,
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            spk_dim=self.spk_dim,
            sampling_rate=self.sampling_rate,
            pallas_snake=self.pallas_snake,
            name="dec",
        )

    def __call__(self, ppg, vec, pit, spec, spk, ppg_l, spec_l, train: bool = True,
                 perturb: bool = True, noise_scale: float = 1.0,
                 slice_ids=None):
        """Full GAN-generator forward (models.py:183-200). pit: [B, T] Hz.

        perturb=False / noise_scale=0.0 / slice_ids freeze every stochastic
        node (loss-parity tests vs the reference with mocked torch RNG).
        """
        rngs = {k: self.make_rng("noise") for k in ["ppg", "vec", "slice"]}
        if perturb:
            # data perturbation (models.py:184-185)
            ppg = ppg + jax.random.normal(rngs["ppg"], ppg.shape, ppg.dtype) * 1.0
            vec = vec + jax.random.normal(rngs["vec"], vec.shape, vec.dtype) * 2.0

        spk_n = spk / jnp.linalg.norm(spk, axis=-1, keepdims=True).clip(1e-12)
        g = self.emb_g(spk_n)
        z_p, m_p, logs_p, ppg_mask, x = self.enc_p(
            ppg, ppg_l, vec, f0_to_coarse(pit), train=train,
            noise_scale=noise_scale,
        )
        z_q, m_q, logs_q, spec_mask = self.enc_q(
            spec, spec_l, g=g, noise_scale=noise_scale
        )

        z_slice, pit_slice, ids_slice = rand_slice_segments_with_pitch(
            rngs["slice"], z_q, pit, spec_l, self.segment_size, ids=slice_ids
        )
        audio = self.dec(spk, z_slice, f0_frames=pit_slice, train=train)

        z_f, logdet_f = self.flow(z_q, spec_mask, g=spk)
        z_r, logdet_r = self.flow(z_p, spec_mask, g=spk, reverse=True)
        spk_preds = self.speaker_classifier(x)
        return TrainOutputs(
            audio, ids_slice, spec_mask, z_f, z_r, z_p, m_p, logs_p,
            z_q, m_q, logs_q, logdet_f, logdet_r, spk_preds,
        )

    def infer(self, ppg, vec, pit, spk, ppg_l):
        """Training-model quick inference (models.py:202-208)."""
        ppg = ppg + jax.random.normal(self.make_rng("noise"), ppg.shape) * 0.0001
        z_p, m_p, logs_p, ppg_mask, x = self.enc_p(ppg, ppg_l, vec, f0_to_coarse(pit))
        z, _ = self.flow(z_p, ppg_mask, g=spk, reverse=True)
        return self.dec(spk, z * ppg_mask, f0_frames=pit)


class SynthesizerInfer(nn.Module):
    """Inference graph — no posterior (reference vits/models.py:211-256)."""

    spec_channels: int = 513
    ppg_dim: int = 1280
    vec_dim: int = 256
    spk_dim: int = 256
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 640
    upsample_rates: tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (15, 8, 8, 4, 4)
    upsample_initial_channel: int = 320
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    sampling_rate: int = 32000
    snake_exact_edges: bool = True
    pallas_snake: bool = False
    # structural depth knobs — must match the SynthesizerTrn the checkpoint
    # was trained with (defaults == reference vits/models.py:211-243)
    enc_p_layers: int = 6
    flow_wn_layers: int = 4
    n_flows: int = 4

    def setup(self):
        self.enc_p = TextEncoder(
            self.ppg_dim, self.vec_dim, self.inter_channels, self.hidden_channels,
            self.filter_channels, 2, self.enc_p_layers, 3, 0.1, name="enc_p",
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1, self.flow_wn_layers,
            n_flows=self.n_flows, gin_channels=self.spk_dim, name="flow",
        )
        self.dec = Generator(
            upsample_input=self.inter_channels,
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            spk_dim=self.spk_dim,
            sampling_rate=self.sampling_rate,
            snake_exact_edges=self.snake_exact_edges,
            pallas_snake=self.pallas_snake,
            name="dec",
        )

    def pitch2source(self, f0_frames, rng=None):
        """Whole-utterance excitation; usable outside apply() — parameter-free
        (reference vits/models.py:245-246)."""
        import math

        from ..nn.nsf import source_hn_nsf

        hop = int(math.prod(self.upsample_rates))
        return source_hn_nsf(f0_frames, hop, self.sampling_rate, rng)

    def __call__(self, ppg, vec, pit, spk, ppg_l, source, noise_scale: float = 1.0):
        """Chunked-inference step (models.py:251-256); source precomputed."""
        z_p, m_p, logs_p, ppg_mask, x = self.enc_p(
            ppg, ppg_l, vec, f0_to_coarse(pit), noise_scale=noise_scale
        )
        z, _ = self.flow(z_p, ppg_mask, g=spk, reverse=True)
        return self.dec(spk, z * ppg_mask, har_source=source)
