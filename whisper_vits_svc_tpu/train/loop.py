"""The training loop — reference vits_extend/train.py:62-311, TPU-native.

Single SPMD process per host: the jitted train step runs over the (data,
model) mesh (no mp.spawn / DDP wrappers); per-epoch exponential LR decay;
rank-0 checkpointing/validation/logging; warm-start from either our msgpack
checkpoints or reference .pth checkpoints (auto-converted).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..data.dataset import BucketBatcher, SvcDataset, boundaries_for
from ..parallel import mesh as pmesh
from ..utils.config import Config
from . import checkpoint as ckpt
from .losses import mel_l1_loss
from .step import init_train_states, make_train_step, set_learning_rate
from .writer import TrainWriter


class TrainDivergence(RuntimeError):
    """Raised by the NaN guard when the loss/grad stream goes non-finite and
    auto-resume is off (or exhausted). Carries the last step whose metrics
    were verified finite, so the operator knows which checkpoint to trust —
    the automation of the manual recovery in docs/TRAIN_RUN_r04.md."""

    def __init__(self, step: int, last_healthy_step: int, detail: str):
        super().__init__(
            f"non-finite training metrics at step {step} ({detail}); "
            f"last step verified healthy: {last_healthy_step}. No checkpoint "
            f"was written past the divergence."
        )
        self.step = step
        self.last_healthy_step = last_healthy_step


class _Diverged(Exception):
    """Internal signal: non-finite metrics detected (detail in args[0])."""


def _check_finite(metrics: dict, guard: bool):
    """Raises _Diverged if any of the health-critical metrics is non-finite.

    Called where metrics are already being materialized to host floats (the
    info_interval log and the pre-checkpoint probe), so it adds no extra
    device syncs to the step loop; detection granularity is info_interval."""
    if not guard:
        return
    bad = [
        k for k in ("loss_g", "loss_d", "grad_norm_g", "grad_norm_d")
        if k in metrics and not np.isfinite(float(metrics[k]))
    ]
    if bad:
        raise _Diverged(", ".join(f"{k}={float(metrics[k])}" for k in bad))


def train(hp: Config, name: str, chkpt_path: str | None = None,
          max_epochs: int | None = None, max_steps: int | None = None,
          profile_dir: str | None = None, profile_steps: int = 10):
    seed = hp.train.seed
    rng = jax.random.PRNGKey(seed)

    pmesh.initialize_distributed(
        hp.dist.get("coordinator_address"), hp.dist.get("num_processes", 1),
        hp.dist.get("process_id", 0),
    )
    # data-axis size must divide the per-host batch; unused devices idle rather
    # than erroring (matters only for tiny test batches)
    import math as _math

    n_dev = len(jax.devices())
    n_data = _math.gcd(hp.train.batch_size * jax.process_count(), n_dev)
    mesh = pmesh.create_mesh(num_data=n_data, devices=jax.devices()[:n_data])
    num_replicas = jax.process_count()

    g_state, d_state, g_model, d_model = init_train_states(hp, rng)
    # donate the state pytrees: XLA updates params/opt-state in place instead
    # of allocating a second copy per step (the loop never reuses the old
    # state — set_learning_rate operates on the returned one)
    train_step = jax.jit(make_train_step(hp, g_model, d_model),
                         donate_argnums=(0, 1))

    init_epoch, step = 1, 0
    pretrain = hp.train.get("pretrain", "")
    if pretrain and os.path.isfile(pretrain):
        payload = (
            ckpt.load_torch_pretrain(pretrain)
            if pretrain.endswith((".pth", ".pt"))
            else ckpt.load(pretrain)
        )
        g_state, d_state = ckpt.warm_start(g_state, d_state, payload)
        print(f"Start from pretrain model: {pretrain}")
    if chkpt_path is not None:
        payload = ckpt.load(chkpt_path)
        g_state, d_state, step, init_epoch = ckpt.restore_states(
            g_state, d_state, payload
        )
        if payload.get("hp_raw") and payload["hp_raw"] != hp.get("raw", ""):
            print("WARNING: new hparams differ from checkpoint; using new.")
        print(f"Resumed from {chkpt_path} at epoch {init_epoch}, step {step}")

    g_state = pmesh.replicate(g_state, mesh)
    d_state = pmesh.replicate(d_state, mesh)

    dataset = SvcDataset(hp.data.training_files, hp.data)
    batcher = BucketBatcher(
        dataset, hp.train.batch_size, boundaries=boundaries_for(hp.data),
        num_replicas=num_replicas, rank=jax.process_index(), seed=seed,
    )
    val_ds = SvcDataset(hp.data.validation_files, hp.data)

    pth_dir = os.path.join(hp.log.pth_dir, name)
    log_dir = os.path.join(hp.log.log_dir, name)
    writer = None
    if pmesh.is_primary():
        os.makedirs(pth_dir, exist_ok=True)
        writer = TrainWriter(log_dir, hp.data.sampling_rate)

    infer_fn = None
    end_epoch = max_epochs or hp.train.epochs
    lr0, gamma = hp.train.learning_rate, hp.train.lr_decay
    sr, hop = hp.data.sampling_rate, hp.data.hop_length

    # NaN guard + (flag-gated) auto-recovery — the manual procedure from
    # docs/TRAIN_RUN_r04.md automated: on non-finite loss/grad-norm, stop
    # writing checkpoints and either halt with the last-healthy step
    # (TrainDivergence) or resume from the newest checkpoint with the LR
    # scaled down by nan_lr_factor, at most nan_max_restarts times.
    guard = bool(hp.train.get("nan_guard", True))
    autoresume = bool(hp.train.get("nan_autoresume", False))
    nan_lr_factor = float(hp.train.get("nan_lr_factor", 0.5))
    restarts_left = int(hp.train.get("nan_max_restarts", 2))
    lr_scale = 1.0
    last_healthy_step = step

    epoch = init_epoch
    while epoch <= end_epoch:
        try:
            lr = lr0 * lr_scale * gamma ** (epoch - 1)
            g_state = set_learning_rate(g_state, lr)
            d_state = set_learning_rate(d_state, lr / hp.train.accum_step)

            if (pmesh.is_primary() and epoch % hp.log.eval_interval == 0
                    and len(val_ds)):
                if infer_fn is None:
                    infer_fn = jax.jit(
                        lambda p, ppg, vec, pit, spk, l, rng: g_model.apply(
                            {"params": p}, ppg, vec, pit, spk, l,
                            method=g_model.infer,
                            rngs={"noise": rng, "dropout": rng},
                        )
                    )
                mel = validate(hp, infer_fn, g_state.params, val_ds, writer, step)
                print(f"epoch {epoch} | validation mel {mel:.4f} | step {step}")

            from ..data.prefetch import prefetch

            t_last, samples_done = time.perf_counter(), 0
            metrics = None
            for batch in prefetch(batcher.epoch_batches(epoch), depth=2):
                if profile_dir is not None and step == 2:
                    # skip compile steps, then capture an xprof trace window
                    jax.profiler.start_trace(profile_dir)
                real_samples = int(batch["spec_l"].sum()) * hop
                batch = pmesh.shard_batch(batch, mesh)
                rng, step_rng = jax.random.split(rng)
                g_state, d_state, metrics = train_step(
                    g_state, d_state, batch, step_rng)
                step += 1
                if profile_dir is not None and step == 2 + profile_steps:
                    jax.block_until_ready(metrics["loss_g"])
                    jax.profiler.stop_trace()
                    profile_dir = None
                samples_done += real_samples
                if step % hp.log.info_interval == 0:
                    # every process checks (loss/grad metrics are replicated
                    # across the mesh, so the verdict is identical everywhere
                    # — a primary-only check would desync a multi-host
                    # restart); logging stays primary-only below
                    metrics = {k: float(v) for k, v in metrics.items()}
                    _check_finite(metrics, guard)
                    last_healthy_step = step
                if pmesh.is_primary() and step % hp.log.info_interval == 0:
                    dt = time.perf_counter() - t_last
                    metrics["audio_seconds_per_s"] = samples_done / sr / dt
                    metrics["steps_per_s"] = hp.log.info_interval / dt
                    t_last, samples_done = time.perf_counter(), 0
                    writer.log_training(metrics, step)
                    print(
                        "epoch %d | g %.04f m %.04f s %.04f d %.04f k %.04f "
                        "r %.04f i %.04f | gn %.02f dn %.02f | step %d" % (
                            epoch, metrics["loss_g"], metrics["loss_m"],
                            metrics["loss_s"], metrics["loss_d"],
                            metrics["loss_k"], metrics["loss_r"],
                            metrics["loss_i"], metrics["grad_norm_g"],
                            metrics["grad_norm_d"], step,
                        )
                    )
                if max_steps is not None and step >= max_steps:
                    break

            if epoch % hp.log.save_interval == 0 and metrics is not None:
                # the last step's metrics reflect exactly the update that
                # produced the current params (NaN grads there => NaN params
                # now), so this probe guarantees no non-finite checkpoint is
                # ever written; run on all processes (replicated verdict)
                _check_finite({k: metrics[k] for k in (
                    "loss_g", "loss_d", "grad_norm_g", "grad_norm_d"
                ) if k in metrics}, guard)
                last_healthy_step = step
            if pmesh.is_primary() and epoch % hp.log.save_interval == 0:
                path = os.path.join(pth_dir, f"{name}_{epoch:04d}.ckpt")
                ckpt.save(path, g_state, d_state, step, epoch, hp.get("raw", ""))
                print(f"Saved checkpoint to: {path}")
                ckpt.clean_checkpoints(pth_dir, name, hp.log.keep_ckpts)

            if max_steps is not None and step >= max_steps:
                break
            epoch += 1

        except _Diverged as exc:
            detail = exc.args[0]
            print(f"NaN guard: non-finite metrics at step {step} ({detail}); "
                  f"last healthy step {last_healthy_step}")
            latest = ckpt.latest_checkpoint(pth_dir, name)
            if not (autoresume and restarts_left > 0 and latest):
                if writer is not None:
                    writer.close()
                raise TrainDivergence(step, last_healthy_step, detail) from None
            restarts_left -= 1
            lr_scale *= nan_lr_factor
            payload = ckpt.load(latest)
            g_state, d_state, step, epoch = ckpt.restore_states(
                g_state, d_state, payload)
            g_state = pmesh.replicate(g_state, mesh)
            d_state = pmesh.replicate(d_state, mesh)
            last_healthy_step = step
            # fresh rng stream per restart: replaying the identical noise
            # into the identical state would re-diverge deterministically
            rng = jax.random.fold_in(
                jax.random.PRNGKey(seed), step * 1000 + restarts_left)
            print(
                f"NaN guard: auto-resumed from {latest} at epoch {epoch}, "
                f"step {step}; lr scaled to x{lr_scale} "
                f"({restarts_left} restarts left)"
            )

    if writer is not None:
        writer.close()
    return g_state, d_state, step


def validate(hp, infer_fn, g_params, val_ds: SvcDataset, writer, step: int) -> float:
    """Full-utterance mel-L1 validation (vits_extend/validation.py:6-46)."""
    data_cfg = dict(
        filter_length=hp.data.filter_length, mel_channels=hp.data.mel_channels,
        sampling_rate=hp.data.sampling_rate, hop_length=hp.data.hop_length,
        win_length=hp.data.win_length, mel_fmin=hp.data.mel_fmin,
        mel_fmax=hp.data.mel_fmax,
    )
    hop = hp.data.hop_length
    pad_to = val_ds.max_frames
    total = 0.0
    for idx in range(len(val_ds)):
        ex = val_ds.get(idx)
        t = ex["ppg"].shape[0]
        ppg = np.zeros((1, pad_to, ex["ppg"].shape[1]), np.float32)
        vec = np.zeros((1, pad_to, ex["vec"].shape[1]), np.float32)
        pit = np.zeros((1, pad_to), np.float32)
        ppg[0, :t], vec[0, :t], pit[0, :t] = ex["ppg"], ex["vec"], ex["pit"]
        fake = infer_fn(
            g_params, ppg, vec, pit, ex["spk"][None],
            np.asarray([t], np.int32), jax.random.PRNGKey(idx),
        )
        n = min(t * hop, len(ex["audio"]))
        fake_np = np.asarray(fake)[0, :n, 0]
        real_np = ex["audio"][:n]
        total += float(
            mel_l1_loss(fake_np[None], real_np[None], data_cfg)
        )
        if writer is not None and idx < hp.log.num_audio:
            writer.log_audio(f"fake/{idx}", fake_np, step)
            if step == 0:
                writer.log_audio(f"real/{idx}", real_np, step)
            if idx == 0:
                from ..ops.stft import linear_spectrogram

                spec_fake = np.asarray(linear_spectrogram(
                    fake_np[None], hp.data.filter_length, hop, hp.data.win_length
                ))[0].T  # [bins, frames]
                spec_real = np.asarray(linear_spectrogram(
                    real_np[None], hp.data.filter_length, hop, hp.data.win_length
                ))[0].T
                writer.log_fig_audio(real_np, fake_np, spec_fake, spec_real, idx, step)
    mel = total / max(len(val_ds), 1)
    if writer is not None:
        writer.log_validation(mel, step)
    return mel
