"""The jitted GAN training step.

One XLA-compiled SPMD program per optimizer step replaces the reference's
eager loop body (vits_extend/train.py:170-247): generator forward with data
perturbation, losses (mel L1, MR-STFT x9, LSGAN score, feature-matching x2,
bidirectional flow KL, GRL cosine speaker loss), generator grads with
accum_step accumulation (optax.MultiSteps — G only, reference train.py:225-232),
then the discriminator update on the detached fake (every step, lr/accum).

Gradient all-reduce over the data mesh axis is implicit: the step is jitted
with batch sharded on `data` and params replicated, so XLA emits the psums
(the NCCL-DDP equivalent, SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.discriminator import Discriminator
from ..models.synthesizer import SynthesizerTrn, slice_segments
from . import losses


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


class Stepper(NamedTuple):
    g_model: SynthesizerTrn
    d_model: Discriminator
    train_step: Any
    g_state: TrainState
    d_state: TrainState


def build_models(hp) -> tuple[SynthesizerTrn, Discriminator]:
    g = SynthesizerTrn(
        spec_channels=hp.data.filter_length // 2 + 1,
        segment_size=hp.data.segment_size // hp.data.hop_length,
        ppg_dim=hp.vits.ppg_dim,
        vec_dim=hp.vits.vec_dim,
        spk_dim=hp.vits.spk_dim,
        gin_channels=hp.vits.gin_channels,
        inter_channels=hp.vits.inter_channels,
        hidden_channels=hp.vits.hidden_channels,
        filter_channels=hp.vits.filter_channels,
        upsample_rates=tuple(hp.gen.upsample_rates),
        upsample_kernel_sizes=tuple(hp.gen.upsample_kernel_sizes),
        upsample_initial_channel=hp.gen.upsample_initial_channel,
        resblock_kernel_sizes=tuple(hp.gen.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(d) for d in hp.gen.resblock_dilation_sizes),
        sampling_rate=hp.data.sampling_rate,
        # depth knobs default to reference values; only micro_hp shrinks them
        enc_p_layers=hp.vits.get("enc_p_layers", 6),
        enc_q_layers=hp.vits.get("enc_q_layers", 16),
        flow_wn_layers=hp.vits.get("flow_wn_layers", 4),
        n_flows=hp.vits.get("n_flows", 4),
        pallas_snake=bool(hp.train.get("pallas_snake")),
    )
    d = Discriminator(
        mrd_resolutions=tuple(tuple(r) for r in hp.mrd.resolutions),
        mpd_periods=tuple(hp.mpd.periods),
        mpd_kernel_size=hp.mpd.kernel_size,
        mpd_stride=hp.mpd.stride,
        lrelu_slope=hp.mpd.lReLU_slope,
        compute_dtype=jnp.bfloat16 if hp.train.get("bf16_discriminator") else None,
        # folded MRD fmaps: identical loss values (count-corrected scale,
        # test-enforced), no unfold/refold layout passes in fwd/bwd
        mrd_fold_fmaps=True,
    )
    return g, d


def _adamw(lr, betas, eps):
    # reference uses torch AdamW with default weight_decay=1e-2
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=1e-2
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Per-epoch ExponentialLR (reference train.py:146-147, gamma=lr_decay).

    Rebuilds the opt-state pytree functionally (no in-place mutation — the
    state may be device-replicated and donated into jit; mutating a leaf dict
    would silently desynchronize shardings)."""

    def _with_lr(inject_state):
        hyper = dict(inject_state.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        return inject_state._replace(hyperparams=hyper)

    opt_state = state.opt_state
    if isinstance(opt_state, optax.MultiStepsState):
        opt_state = opt_state._replace(inner_opt_state=_with_lr(opt_state.inner_opt_state))
    else:
        opt_state = _with_lr(opt_state)
    return state.replace(opt_state=opt_state)


def init_train_states(
    hp, rng, init_frames: int = 100, init_batch: int = 2
) -> tuple[TrainState, TrainState, SynthesizerTrn, Discriminator]:
    """Param shapes don't depend on (init_frames, init_batch); smaller values
    only cheapen the one-off init compile (the CPU-mesh dryrun uses 32/1).
    init_frames must stay >= the segment slice (segment_size/hop)."""
    g_model, d_model = build_models(hp)
    t_frames = init_frames
    seg = hp.data.segment_size
    b = init_batch
    dummy = dict(
        ppg=jnp.zeros((b, t_frames, hp.vits.ppg_dim)),
        vec=jnp.zeros((b, t_frames, hp.vits.vec_dim)),
        pit=jnp.full((b, t_frames), 200.0),
        spec=jnp.zeros((b, t_frames, hp.data.filter_length // 2 + 1)),
        spk=jnp.ones((b, hp.vits.spk_dim)),
        ppg_l=jnp.full((b,), t_frames, jnp.int32),
        spec_l=jnp.full((b,), t_frames, jnp.int32),
    )
    rng, g_rng, n_rng = jax.random.split(rng, 3)
    # flax init runs eagerly (per-op dispatch); jit compiles it as one XLA
    # program — ~3x faster trainer bring-up on CPU, free on TPU
    g_params = jax.jit(g_model.init)(
        {"params": g_rng, "noise": n_rng, "dropout": n_rng},
        dummy["ppg"], dummy["vec"], dummy["pit"], dummy["spec"], dummy["spk"],
        dummy["ppg_l"], dummy["spec_l"],
    )["params"]
    rng, d_rng = jax.random.split(rng)
    d_params = jax.jit(d_model.init)(d_rng, jnp.zeros((b, seg, 1)))["params"]

    lr = hp.train.learning_rate
    g_tx = optax.MultiSteps(
        _adamw(lr, hp.train.betas, hp.train.eps), every_k_schedule=hp.train.accum_step
    )
    d_tx = _adamw(lr / hp.train.accum_step, hp.train.betas, hp.train.eps)
    g_state = TrainState(g_params, g_tx.init(g_params), g_tx)
    d_state = TrainState(d_params, d_tx.init(d_params), d_tx)
    return g_state, d_state, g_model, d_model


def make_train_step(hp, g_model: SynthesizerTrn, d_model: Discriminator):
    """Returns jittable (g_state, d_state, batch, rng) -> (g, d, metrics)."""
    hop = hp.data.hop_length
    seg_samples = hp.data.segment_size
    resolutions = tuple(tuple(r) for r in hp.mrd.resolutions)
    data_cfg = dict(
        filter_length=hp.data.filter_length,
        mel_channels=hp.data.mel_channels,
        sampling_rate=hp.data.sampling_rate,
        hop_length=hp.data.hop_length,
        win_length=hp.data.win_length,
        mel_fmin=hp.data.mel_fmin,
        mel_fmax=hp.data.mel_fmax,
    )
    c_mel, c_stft, c_kl = hp.train.c_mel, hp.train.c_stft, hp.train.c_kl
    # opt-in elementwise grad-value clip: the reference's clip_grad_value_
    # accepts a value but is called with None (vits_extend/train.py:229,246;
    # vits/commons.py:172-187 — norm computed on the RAW grads, then clamp)
    clip_value = hp.train.get("clip_grad_value", None)

    def joint_loss_fn(gd_params, batch, rng):
        """loss_g + loss_d in ONE backward. Cross-terms are cut with
        stop_gradient (G's adversarial terms see frozen D params; D's loss
        sees detached fake audio), so d(total)/d(g_params) == the reference's
        G gradient and d(total)/d(d_params) == its D gradient exactly — the
        reference computes them as two separate backprops
        (vits_extend/train.py:223-247). The win: the fake/real discriminator
        FORWARD subgraphs appear twice but are value-identical, so XLA CSEs
        them — one D forward each instead of two (the discriminators are the
        most expensive part of the step; see docs/PERFORMANCE.md)."""
        g_params, d_params = gd_params
        out = g_model.apply(
            {"params": g_params},
            batch["ppg"], batch["vec"], batch["pit"], batch["spec"],
            batch["spk"], batch["ppg_l"], batch["spec_l"],
            rngs={"noise": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        audio_real = slice_segments(batch["audio"], out.ids_slice * hop, seg_samples)
        fake = out.fake_audio

        spk_loss = losses.cosine_speaker_loss(batch["spk"], out.spk_preds)
        mel_loss = losses.mel_l1_loss(fake[..., 0], audio_real[..., 0], data_cfg) * c_mel
        sc_loss, mag_loss = losses.multi_resolution_stft_loss(
            fake[..., 0], audio_real[..., 0], resolutions
        )
        stft_loss = (sc_loss + mag_loss) * c_stft

        b = fake.shape[0]

        def split(outs):
            """Un-concatenate a fake||real batched discriminator output."""
            f = [([m[:b] for m in fmap], s[:b]) for fmap, s in outs]
            r = [([m[b:] for m in fmap], s[b:]) for fmap, s in outs]
            return f, r

        # fake and real share one discriminator apply per parameter set
        # (batch-concatenated): 2 applies instead of 4 — the sub-discriminator
        # convs are batch-independent so results are identical, and the
        # doubled batch feeds the MXU better at the segment's small spatial
        # sizes (MRD was the costliest step component, docs/PERFORMANCE.md)
        d_frozen = jax.lax.stop_gradient(d_params)
        disc_fake, disc_real = split(
            d_model.apply({"params": d_frozen},
                          jnp.concatenate([fake, audio_real], axis=0))
        )
        score_loss = losses.generator_adversarial_loss(disc_fake)
        feat_loss = losses.feature_matching_loss(disc_fake, disc_real)

        loss_kl_f = losses.kl_loss(
            out.z_f, out.logs_q, out.m_p, out.logs_p, out.logdet_f, out.spec_mask
        ) * c_kl
        loss_kl_r = losses.kl_loss(
            out.z_r, out.logs_p, out.m_q, out.logs_q, out.logdet_r, out.spec_mask
        ) * c_kl

        loss_g = (
            score_loss + feat_loss + mel_loss + stft_loss
            + loss_kl_f + loss_kl_r * 0.5 + spk_loss * 2.0
        )

        disc_fake_d, disc_real_d = split(
            d_model.apply(
                {"params": d_params},
                jnp.concatenate([jax.lax.stop_gradient(fake), audio_real], axis=0),
            )
        )
        loss_d = losses.discriminator_adversarial_loss(disc_fake_d, disc_real_d)

        metrics = dict(
            loss_g=loss_g, loss_m=mel_loss, loss_s=stft_loss, loss_k=loss_kl_f,
            loss_r=loss_kl_r, loss_i=spk_loss, score_loss=score_loss,
            feat_loss=feat_loss, loss_d=loss_d,
        )
        return loss_g + loss_d, metrics

    def train_step(g_state: TrainState, d_state: TrainState, batch, rng):
        (_, metrics), (g_grads, d_grads) = jax.value_and_grad(
            joint_loss_fn, has_aux=True
        )((g_state.params, d_state.params), batch, rng)
        # the reference reports global grad norms every step even with
        # clipping disabled (vits/commons.py:172-187 via train.py:227,245);
        # free inside the jitted step, and the main training-health signal
        metrics["grad_norm_g"] = optax.global_norm(g_grads)
        metrics["grad_norm_d"] = optax.global_norm(d_grads)
        if clip_value is not None:
            clamp = partial(jax.tree.map,
                            lambda x: jnp.clip(x, -clip_value, clip_value))
            g_grads, d_grads = clamp(g_grads), clamp(d_grads)
        g_state = g_state.apply_gradients(g_grads)
        d_state = d_state.apply_gradients(d_grads)
        return g_state, d_state, metrics

    return train_step
