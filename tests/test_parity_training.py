"""Training-graph loss parity vs the reference.

Runs the FULL training forward (SynthesizerTrn) and every loss term of the
GAN objective (vits_extend/train.py:183-247) on identical weights and inputs
with all stochastic nodes frozen on both sides (torch randn/rand mocked to
zeros; our perturb=False / noise_scale=0 / slice_ids=0), and requires each
term — mel L1, MR-STFT, LSGAN score, feature matching, both flow KLs, GRL
cosine, and the discriminator loss — to agree. This pins the training
dynamics' forward semantics (SURVEY.md hard part 3).
"""

import sys
import types
from unittest import mock

import pytest
import numpy as np
import torch

import ref_stubs

ref_stubs.install()
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_vits_svc_tpu.models import convert  # noqa: E402
from whisper_vits_svc_tpu.train import losses as jlosses  # noqa: E402
from whisper_vits_svc_tpu.utils.testing import tiny_hp  # noqa: E402


def _ref_hp(hp):
    def ns(**kw):
        return types.SimpleNamespace(**kw)

    return ns(
        vits=ns(**hp.vits.to_dict()),
        gen=ns(**hp.gen.to_dict()),
        data=ns(**hp.data.to_dict()),
        mpd=ns(periods=list(hp.mpd.periods), kernel_size=hp.mpd.kernel_size,
               stride=hp.mpd.stride, use_spectral_norm=False,
               lReLU_slope=hp.mpd.lReLU_slope),
        mrd=ns(resolutions="ignored", use_spectral_norm=False,
               lReLU_slope=hp.mrd.lReLU_slope),
    )


def _zeros_like(x, **kw):
    return torch.zeros_like(x)


def _zeros(*shape, **kw):
    kw.pop("generator", None)
    return torch.zeros(*shape, **kw)


@pytest.mark.slow
def test_training_losses_match_reference(rng):
    from vits.losses import kl_loss as t_kl_loss
    from vits.models import SynthesizerTrn as TTrn
    from vits_decoder.mpd import MultiPeriodDiscriminator
    from vits_decoder.mrd import DiscriminatorR
    from vits_decoder.msd import ScaleDiscriminator as TMSD
    from vits_extend.stft import TacotronSTFT
    from vits_extend.stft_loss import MultiResolutionSTFTLoss

    from whisper_vits_svc_tpu.models.discriminator import Discriminator
    from whisper_vits_svc_tpu.train.step import build_models

    hp = tiny_hp()
    # the reference AMPBlock hardcodes three dilated convs (bigv.py:22-29)
    hp["gen"]["resblock_dilation_sizes"] = [[1, 3, 5]]
    seg_frames = hp.data.segment_size // hp.data.hop_length
    resolutions = [tuple(r) for r in hp.mrd.resolutions]

    torch.manual_seed(0)
    rhp = _ref_hp(hp)
    spec_ch = hp.data.filter_length // 2 + 1
    ref_g = TTrn(spec_ch, seg_frames, rhp)
    ref_g.train(False)
    mrds = [DiscriminatorR(rhp, r) for r in resolutions]
    mpd = MultiPeriodDiscriminator(rhp)
    msd = TMSD()
    for m in mrds + [mpd, msd]:
        m.train(False)

    B, T = 2, 20
    hop = hp.data.hop_length
    ppg = rng.standard_normal((B, T, hp.vits.ppg_dim)).astype(np.float32) * 0.2
    vec = rng.standard_normal((B, T, hp.vits.vec_dim)).astype(np.float32) * 0.2
    pit = rng.uniform(100, 400, (B, T)).astype(np.float32)
    spk = rng.standard_normal((B, hp.vits.spk_dim)).astype(np.float32)
    spec = np.abs(rng.standard_normal((B, T, spec_ch))).astype(np.float32)
    audio = (rng.standard_normal((B, T * hop)) * 0.2).astype(np.float32)
    lengths = np.full((B,), T, np.int64)

    # ---- reference side, RNG frozen ----
    with mock.patch.object(torch, "randn_like", _zeros_like), \
         mock.patch.object(torch, "rand", _zeros):
        with torch.no_grad():
            fake, ids_slice, z_mask, \
                (z_f, z_r, z_p, m_p, logs_p, z_q, m_q, logs_q, logdet_f,
                 logdet_r), spk_preds = ref_g(
                torch.from_numpy(ppg.transpose(0, 2, 1)).transpose(1, -1)
                if False else torch.from_numpy(ppg),
                torch.from_numpy(vec), torch.from_numpy(pit),
                torch.from_numpy(spec.transpose(0, 2, 1)),
                torch.from_numpy(spk), torch.from_numpy(lengths),
                torch.from_numpy(lengths),
            )
            assert (ids_slice == 0).all()
            audio_t = torch.from_numpy(audio)[:, None, :]
            real_slice = audio_t[:, :, : seg_frames * hop]

            stft = TacotronSTFT(
                filter_length=hp.data.filter_length, hop_length=hop,
                win_length=hp.data.win_length,
                n_mel_channels=hp.data.mel_channels,
                sampling_rate=hp.data.sampling_rate, mel_fmin=hp.data.mel_fmin,
                mel_fmax=hp.data.mel_fmax, center=False, device="cpu",
            )
            mel_loss_t = torch.nn.functional.l1_loss(
                stft.mel_spectrogram(fake.squeeze(1)),
                stft.mel_spectrogram(real_slice.squeeze(1)),
            ) * hp.train.c_mel
            sc_t, mag_t = MultiResolutionSTFTLoss("cpu", resolutions)(
                fake.squeeze(1), real_slice.squeeze(1)
            )
            stft_loss_t = (sc_t + mag_t) * hp.train.c_stft

            def run_d(x):
                return [d(x) for d in mrds] + list(mpd(x)) + list(msd(x))

            disc_fake = run_d(fake)
            disc_real = run_d(real_slice)
            score_t = sum(torch.mean((s - 1.0) ** 2) for _, s in disc_fake) / len(disc_fake)
            feat_t = sum(
                torch.mean(torch.abs(f - r))
                for (ff, _), (fr, _) in zip(disc_fake, disc_real)
                for f, r in zip(ff, fr)
            ) / len(disc_fake) * 2
            loss_d_t = sum(
                torch.mean((sr_ - 1.0) ** 2) + torch.mean(sf_**2)
                for (_, sf_), (_, sr_) in zip(disc_fake, disc_real)
            ) / len(disc_fake)
            kl_f_t = t_kl_loss(z_f, logs_q, m_p, logs_p, logdet_f, z_mask) * hp.train.c_kl
            kl_r_t = t_kl_loss(z_r, logs_p, m_q, logs_q, logdet_r, z_mask) * hp.train.c_kl
            spk_loss_t = torch.nn.CosineEmbeddingLoss()(
                torch.from_numpy(spk), spk_preds, torch.ones(B)
            )

    # ---- our side, same weights, frozen randomness ----
    g_model, d_model = build_models(hp)
    g_init = g_model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        ppg, vec, pit, spec, spk, lengths.astype(np.int32),
        lengths.astype(np.int32),
    )["params"]
    g_params = convert.merge_into(g_init, convert.synthesizer_trn(ref_g.state_dict()))

    sd = {}
    for i, d in enumerate(mrds):
        sd.update({f"MRD.discriminators.{i}.{k}": v for k, v in d.state_dict().items()})
    sd.update({f"MPD.{k}": v for k, v in mpd.state_dict().items()})
    sd.update({f"MSD.{k}": v for k, v in msd.state_dict().items()})
    d_init = d_model.init(jax.random.PRNGKey(3),
                          jnp.zeros((B, seg_frames * hop, 1)))["params"]
    d_params = convert.merge_into(d_init, convert.discriminator(sd))

    out = g_model.apply(
        {"params": g_params}, ppg, vec, pit, spec, spk,
        lengths.astype(np.int32), lengths.astype(np.int32),
        train=False, perturb=False, noise_scale=0.0,
        slice_ids=jnp.zeros((B,), jnp.int32),
        rngs={"noise": jax.random.PRNGKey(9), "dropout": jax.random.PRNGKey(9)},
    )
    np.testing.assert_allclose(
        np.asarray(out.fake_audio)[..., 0], fake.squeeze(1).numpy(),
        rtol=5e-3, atol=5e-3,
    )

    real_j = audio[:, : seg_frames * hop]
    data_cfg = dict(
        filter_length=hp.data.filter_length, mel_channels=hp.data.mel_channels,
        sampling_rate=hp.data.sampling_rate, hop_length=hop,
        win_length=hp.data.win_length, mel_fmin=hp.data.mel_fmin,
        mel_fmax=hp.data.mel_fmax,
    )
    fake_j = out.fake_audio[..., 0]
    mel_loss_j = jlosses.mel_l1_loss(fake_j, real_j, data_cfg) * hp.train.c_mel
    sc_j, mag_j = jlosses.multi_resolution_stft_loss(fake_j, real_j, resolutions)
    stft_loss_j = (sc_j + mag_j) * hp.train.c_stft

    disc_fake_j = d_model.apply({"params": d_params}, out.fake_audio)
    disc_real_j = d_model.apply({"params": d_params}, real_j[..., None])
    score_j = jlosses.generator_adversarial_loss(disc_fake_j)
    feat_j = jlosses.feature_matching_loss(disc_fake_j, disc_real_j)
    loss_d_j = jlosses.discriminator_adversarial_loss(disc_fake_j, disc_real_j)
    kl_f_j = jlosses.kl_loss(out.z_f, out.logs_q, out.m_p, out.logs_p,
                             out.logdet_f, out.spec_mask) * hp.train.c_kl
    kl_r_j = jlosses.kl_loss(out.z_r, out.logs_p, out.m_q, out.logs_q,
                             out.logdet_r, out.spec_mask) * hp.train.c_kl
    spk_j = jlosses.cosine_speaker_loss(spk, out.spk_preds)

    for name, ours, ref in [
        ("mel", mel_loss_j, mel_loss_t), ("stft", stft_loss_j, stft_loss_t),
        ("score", score_j, score_t), ("feat", feat_j, feat_t),
        ("kl_f", kl_f_j, kl_f_t), ("kl_r", kl_r_j, kl_r_t),
        ("spk", spk_j, spk_loss_t), ("disc", loss_d_j, loss_d_t),
    ]:
        np.testing.assert_allclose(
            float(ours), float(ref), rtol=2e-2, atol=2e-3, err_msg=name
        )
