"""GAN + flow losses for the SVC trainer.

Faithful ports of the loss *semantics* of reference vits/losses.py and the
inline loss assembly in vits_extend/train.py:189-222, expressed as pure JAX
functions over [B, T, C] tensors. The MR-STFT loss reuses the shared
ops.stft kernels (one fused graph; the reference re-runs torch.stft per
resolution per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import mel_spectrogram, stft_loss_magnitude


def kl_loss(z, logs_q, m_p, logs_p, total_logdet, z_mask):
    """Flow-KL with logdet (negative-LL form) — reference vits/losses.py:43-61.

    z, logs_q, m_p, logs_p: [B, T, C]; total_logdet: [B]; z_mask: [B, T, 1].
    """
    z = z.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * jnp.square(z - m_p) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    kl = kl - jnp.sum(total_logdet)
    # divisor is the mask-element count only (reference losses.py:59-60 sums a
    # [b,1,t] mask while kl summed over channels too)
    return kl / jnp.sum(z_mask)


def generator_adversarial_loss(disc_fake):
    """mean((score-1)^2) averaged over discriminators (train.py:203-207)."""
    loss = 0.0
    for _, score in disc_fake:
        loss = loss + jnp.mean(jnp.square(score - 1.0))
    return loss / len(disc_fake)


def feature_matching_loss(disc_fake, disc_real):
    """L1 feature matching, /len(disc) then x2 (train.py:210-216)."""
    loss = 0.0
    for (feat_fake, _), (feat_real, _) in zip(disc_fake, disc_real):
        for f, r in zip(feat_fake, feat_real):
            loss = loss + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return loss / len(disc_fake) * 2.0


def discriminator_adversarial_loss(disc_fake, disc_real):
    """LSGAN D loss averaged over discriminators (train.py:239-244)."""
    loss = 0.0
    for (_, score_fake), (_, score_real) in zip(disc_fake, disc_real):
        loss = loss + jnp.mean(jnp.square(score_real - 1.0))
        loss = loss + jnp.mean(jnp.square(score_fake))
    return loss / len(disc_fake)


def multi_resolution_stft_loss(fake, real, resolutions):
    """(sc_loss, mag_loss) averaged over resolutions (stft_loss.py:97-135).

    fake/real: [B, T] waveforms. sc = ||Y|-|X||_F / ||Y||_F; mag = L1(log).
    """
    sc_loss = 0.0
    mag_loss = 0.0
    for n_fft, hop, win in resolutions:
        x_mag = stft_loss_magnitude(fake, n_fft, hop, win)
        y_mag = stft_loss_magnitude(real, n_fft, hop, win)
        sc_loss = sc_loss + jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
        mag_loss = mag_loss + jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    n = len(resolutions)
    return sc_loss / n, mag_loss / n


def mel_l1_loss(fake, real, data_cfg):
    """Tacotron-mel L1 (train.py:196-199). fake/real: [B, T] waveforms."""
    kw = dict(
        n_fft=data_cfg["filter_length"],
        num_mels=data_cfg["mel_channels"],
        sampling_rate=data_cfg["sampling_rate"],
        hop=data_cfg["hop_length"],
        win_length=data_cfg["win_length"],
        fmin=data_cfg["mel_fmin"],
        fmax=data_cfg["mel_fmax"],
    )
    return jnp.mean(jnp.abs(mel_spectrogram(fake, **kw) - mel_spectrogram(real, **kw)))


def cosine_speaker_loss(spk, spk_preds):
    """CosineEmbeddingLoss with target=1 (train.py:150,190-192)."""
    cos = jnp.sum(spk * spk_preds, axis=-1) / (
        jnp.linalg.norm(spk, axis=-1) * jnp.linalg.norm(spk_preds, axis=-1) + 1e-12
    )
    return jnp.mean(1.0 - cos)
