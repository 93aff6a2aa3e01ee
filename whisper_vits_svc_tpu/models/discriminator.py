"""Composite GAN discriminator: MRD + MPD + MSD.

Reference vits_decoder/{discriminator,mpd,mrd,msd}.py. Returns a list of
(feature_maps, score) pairs in MRD, MPD, MSD order (discriminator.py:17-21).
Audio layout is [B, T, 1]; the MRD spectrogram front-end reuses the shared
ops.stft.mrd_magnitude kernel (window-less STFT quirk preserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.conv import FOLD_R, Conv1d, Conv2d
from ..ops.stft import mrd_magnitude


class DiscriminatorP(nn.Module):
    """Period discriminator (reference vits_decoder/mpd.py:6-44)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    lrelu_slope: float = 0.2
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array):
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        fmap = []
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        # [B, T, 1] -> [B, T/p, p, C] (torch: [B, C, T/p, p], NCHW->NHWC)
        x = x.reshape(b, t // self.period, self.period, c)
        chs = [64, 128, 256, 512]
        for i, ch in enumerate(chs):
            x = Conv2d(
                ch, (self.kernel_size, 1), stride=(self.stride, 1),
                padding=(self.kernel_size // 2, 0), weight_norm=True,
                name=f"convs_{i}",
            )(x)
            x = jax.nn.leaky_relu(x, self.lrelu_slope)
            fmap.append(x)
        x = Conv2d(1024, (self.kernel_size, 1), padding=(self.kernel_size // 2, 0),
                   weight_norm=True, name="convs_4")(x)
        x = jax.nn.leaky_relu(x, self.lrelu_slope)
        fmap.append(x)
        x = Conv2d(1, (3, 1), padding=(1, 0), weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        if self.compute_dtype is not None:
            fmap = [f.astype(jnp.float32) for f in fmap]
            x = x.astype(jnp.float32)
        return fmap, x.reshape(b, -1)


def _fold_freq(h: jax.Array, r: int = FOLD_R) -> jax.Array:
    """[B, F, T, C] -> [B, ceil(F/r), T, r*C] (freq blocks outer, C inner)."""
    b, f, t, c = h.shape
    fp = -(-f // r) * r
    if fp != f:
        h = jnp.pad(h, ((0, 0), (0, fp - f), (0, 0), (0, 0)))
    return h.reshape(b, fp // r, r, t, c).transpose(0, 1, 3, 2, 4).reshape(
        b, fp // r, t, r * c)


def _unfold_freq(h: jax.Array, f: int, r: int = FOLD_R) -> jax.Array:
    """Inverse of _fold_freq: [B, F', T, r*C] -> [B, f, T, C]."""
    b, fq, t, rc = h.shape
    c = rc // r
    h = h.reshape(b, fq, t, r, c).transpose(0, 1, 3, 2, 4).reshape(b, fq * r, t, c)
    return h[:, :f]


class DiscriminatorR(nn.Module):
    """Resolution discriminator on window-less STFT magnitude (mrd.py:6-46).

    fold_freq=True runs the conv stack in the 4-way freq-to-channel folded
    layout (nn.conv._fold_freq_kernel): every conv becomes 128-in/128-out
    channels, which tiles the MXU fully instead of using 32 of 128 lanes —
    the MRD was the costliest component of the train step
    (docs/PERFORMANCE.md). Returned fmaps/scores are unfolded back, so
    outputs (and therefore every loss) are exactly the unfolded path's up to
    float summation order; parameters are identical either way.
    """

    resolution: tuple[int, int, int]   # (n_fft, hop, win_length)
    lrelu_slope: float = 0.2
    compute_dtype: jnp.dtype | None = None
    fold_freq: bool = True
    # fold_fmaps=True returns the layer fmaps IN the folded layout, scaled by
    # 4*fq/bins so jnp.mean-based L1 feature matching over them equals the
    # unfolded mean exactly (pad rows are masked to 0 on both sides of the
    # |fake-real| difference; only the element COUNT differs, which the scale
    # corrects). Kills an unfold copy per layer per resolution — and its
    # re-fold adjoint in backward — that a device trace showed as the
    # dominant data-formatting cost of the train step. The score path always
    # unfolds (1 channel, 32x smaller). Value/grad equality is test-enforced.
    fold_fmaps: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        fmap = []
        n_fft, hop, win = self.resolution
        # the STFT front-end stays f32 regardless of compute dtype (magnitude
        # cancellation is precision-sensitive); only the conv stack drops
        mag = mrd_magnitude(x[..., 0].astype(jnp.float32), n_fft, hop, win)
        # torch conv sees [B, 1, bins(freq=H), frames(W)] -> NHWC [B, bins, frames, 1]
        h = mag.transpose(0, 2, 1)[..., None]
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        specs = [
            dict(kernel_size=(3, 9), stride=(1, 1), padding=(1, 4)),
            dict(kernel_size=(3, 9), stride=(1, 2), padding=(1, 4)),
            dict(kernel_size=(3, 9), stride=(1, 2), padding=(1, 4)),
            dict(kernel_size=(3, 9), stride=(1, 2), padding=(1, 4)),
            dict(kernel_size=(3, 3), stride=(1, 1), padding=(1, 1)),
        ]
        if self.fold_freq:
            bins = h.shape[1]
            # rows 4*f'+j >= bins are fold padding: they accumulate bias +
            # activation garbage, and the NEXT conv's super-tap would read
            # them where the unfolded op reads its zero pad — mask to 0 after
            # every layer (fuses into the conv epilogue)
            fq = -(-bins // FOLD_R)
            mvec = (jnp.arange(fq * FOLD_R) < bins).reshape(fq, FOLD_R)
            # count correction for folded-fmap means (see fold_fmaps above)
            scale = jnp.asarray(FOLD_R * fq / bins, h.dtype)
            h = _fold_freq(h)
            for i, s in enumerate(specs):
                h = Conv2d(32, weight_norm=True, freq_folded=True,
                           name=f"convs_{i}", **s)(h)
                h = jax.nn.leaky_relu(h, self.lrelu_slope)
                h = h * jnp.repeat(mvec, h.shape[-1] // FOLD_R,
                                   axis=1)[None, :, None, :].astype(h.dtype)
                fmap.append(h * scale if self.fold_fmaps
                            else _unfold_freq(h, bins))
            h = Conv2d(1, (3, 3), padding=(1, 1), weight_norm=True,
                       freq_folded=True, name="conv_post")(h)
            if self.fold_fmaps:
                # conv_post's fold-pad rows hold bias garbage (no mask was
                # applied after it) — mask before the fmap copy
                fmap.append(h * (mvec[None, :, None, :].astype(h.dtype) * scale))
                h = _unfold_freq(h, bins)
            else:
                h = _unfold_freq(h, bins)
                fmap.append(h)
        else:
            for i, s in enumerate(specs):
                h = Conv2d(32, weight_norm=True, name=f"convs_{i}", **s)(h)
                h = jax.nn.leaky_relu(h, self.lrelu_slope)
                fmap.append(h)
            h = Conv2d(1, (3, 3), padding=(1, 1), weight_norm=True,
                       name="conv_post")(h)
            fmap.append(h)
        if self.compute_dtype is not None:
            fmap = [f.astype(jnp.float32) for f in fmap]
            h = h.astype(jnp.float32)
        return fmap, h.reshape(h.shape[0], -1)


class ScaleDiscriminator(nn.Module):
    """Raw-waveform scale discriminator (reference vits_decoder/msd.py:7-29).

    merge_groups=True (default) executes the grouped k=41 stacks with
    block-diagonally expanded kernels so each execution group carries >=64
    input channels — the 4-channel groups are MXU-hostile and dominated the
    roofline audit at 3.4% of bound (per-layer fwd+bwd ~0.5 ms EACH
    regardless of T, tools/diag_msd.py). Exact: params, checkpoints and
    values are unchanged (off-block weights are literal zeros; loss/grad
    equality test-enforced)."""

    compute_dtype: jnp.dtype | None = None
    merge_groups: bool = True

    @nn.compact
    def __call__(self, x: jax.Array):
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        fmap = []
        specs = [
            dict(features=16, kernel_size=15, stride=1, padding=7, groups=1),
            dict(features=64, kernel_size=41, stride=4, padding=20, groups=4),
            dict(features=256, kernel_size=41, stride=4, padding=20, groups=16),
            dict(features=1024, kernel_size=41, stride=4, padding=20, groups=64),
            dict(features=1024, kernel_size=41, stride=4, padding=20, groups=256),
            dict(features=1024, kernel_size=5, stride=1, padding=2, groups=1),
        ]
        h = x
        for i, s in enumerate(specs):
            if self.merge_groups and s["groups"] > 1:
                cig = h.shape[-1] // s["groups"]
                m = min(s["groups"], max(1, 64 // cig))
                s = dict(s, merge_groups_to=s["groups"] // m)
            h = Conv1d(weight_norm=True, name=f"convs_{i}", **s)(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = Conv1d(1, 3, padding=1, weight_norm=True, name="conv_post")(h)
        fmap.append(h)
        if self.compute_dtype is not None:
            fmap = [f.astype(jnp.float32) for f in fmap]
            h = h.astype(jnp.float32)
        return fmap, h.reshape(h.shape[0], -1)


class MelspecDiscriminator(nn.Module):
    """48 kHz mel-spectrogram discriminator (reference vits_decoder/med.py:6-65).

    Present-but-unwired, exactly as in the reference (not part of the
    composite Discriminator). GLU-gated BatchNorm conv stack over an HTK-mel
    magnitude spectrogram; BatchNorm runs in inference mode (folded affine) —
    wire it in and switch to train-mode statistics if you enable it for
    training.
    """

    sample_rate: int = 48000

    @nn.compact
    def __call__(self, x: jax.Array):
        from ..ops.mel import mel_filterbank
        from ..ops.stft import stft_magnitude

        n_fft = 2048
        win = int(0.025 * self.sample_rate)
        hop = int(0.010 * self.sample_rate)
        mag = stft_magnitude(x[..., 0], n_fft, hop, win, center=True)
        mel_w = jnp.asarray(
            mel_filterbank(self.sample_rate, n_fft, 128, htk=True, norm=None).T
        )
        mel = jnp.einsum("btf,fm->btm", mag, mel_w, preferred_element_type=jnp.float32)
        h = jnp.log(mel + 1e-5)
        # torch layout [B, 1, mels(H), frames(W)] -> NHWC [B, mels, frames, 1]
        h = h.transpose(0, 2, 1)[..., None]

        fmap = []
        kernel_sizes = [(7, 7), (4, 4), (4, 4), (4, 4)]
        strides = [(1, 2)] * 4
        for i, (k, s) in enumerate(zip(kernel_sizes, strides)):
            h = Conv2d(64, k, stride=s, padding=(1, 2), use_bias=False,
                       name=f"convs_{i}")(h)
            scale = self.param(f"bn{i}_scale", nn.initializers.ones, (64,))
            bias = self.param(f"bn{i}_bias", nn.initializers.zeros, (64,))
            h = h * scale + bias
            a, b = jnp.split(h, 2, axis=-1)  # GLU over channels (torch dim=1)
            h = a * jax.nn.sigmoid(b)
            fmap.append(h)
        h = Conv2d(1, (15, 3), stride=(1, 2), name="postnet")(h)
        score = jnp.mean(h, axis=(1, 2, 3))
        return [(fmap, score)]


class Discriminator(nn.Module):
    """MRD + MPD + MSD composite (reference vits_decoder/discriminator.py:10-21)."""

    mrd_resolutions: tuple[tuple[int, int, int], ...] = (
        (1024, 120, 600), (2048, 240, 1200), (4096, 480, 2400), (512, 50, 240)
    )
    mpd_periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    mpd_kernel_size: int = 5
    mpd_stride: int = 3
    lrelu_slope: float = 0.2
    # bf16 runs the conv stacks (not the STFT front-ends) on the MXU's native
    # dtype; params/grads/losses stay f32. Flag-gated mixed precision — the
    # reference trains f32 (no AMP in vits_extend/train.py).
    compute_dtype: jnp.dtype | None = None
    mrd_fold_freq: bool = True
    # folded-layout MRD fmaps (scaled for exact mean-L1 equality) — see
    # DiscriminatorR.fold_fmaps; enabled by the trainer, off for parity tests
    mrd_fold_fmaps: bool = False
    # MSD group merging (exact block-diagonal execution) — ScaleDiscriminator
    msd_merge_groups: bool = True

    @nn.compact
    def __call__(self, x: jax.Array):
        out = []
        for i, res in enumerate(self.mrd_resolutions):
            out.append(DiscriminatorR(tuple(res), self.lrelu_slope,
                                      self.compute_dtype,
                                      fold_freq=self.mrd_fold_freq,
                                      fold_fmaps=self.mrd_fold_fmaps,
                                      name=f"mrd_{i}")(x))
        for i, p in enumerate(self.mpd_periods):
            out.append(
                DiscriminatorP(
                    p, self.mpd_kernel_size, self.mpd_stride, self.lrelu_slope,
                    self.compute_dtype, name=f"mpd_{i}",
                )(x)
            )
        out.append(ScaleDiscriminator(self.compute_dtype,
                                      merge_groups=self.msd_merge_groups,
                                      name="msd")(x))
        return out
