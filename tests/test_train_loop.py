"""End-to-end training-loop test on a synthetic data_svc cache.

Builds a miniature on-disk dataset in the reference's cache layout
(wave/spec/pitch/vec/ppg/spk + filelist), runs a few real optimizer steps
through the full loop (buckets -> shard -> jitted GAN step), saves and
re-loads a checkpoint, and warm-starts from the export.
"""

import os

import numpy as np
import pytest

from whisper_vits_svc_tpu.data.dataset import BucketBatcher, SvcDataset
from whisper_vits_svc_tpu.train import checkpoint as ckpt
from whisper_vits_svc_tpu.utils.audio_io import save_wav
from whisper_vits_svc_tpu.utils.testing import tiny_hp


def _make_data(tmp_path, rng, hp):
    hop = hp.data.hop_length
    sr = hp.data.sampling_rate
    seg_frames = hp.data.segment_size // hop  # 8
    rows = []
    for i in range(6):
        frames = int(rng.integers(seg_frames * 5, seg_frames * 17))  # 40..136
        d = tmp_path / f"item{i}"
        d.mkdir()
        wav = (rng.standard_normal(frames * hop) * 0.1).astype(np.float32)
        save_wav(str(d / "a.wav"), wav, sr)
        np.save(d / "a.spec.npy",
                np.abs(rng.standard_normal((frames, hp.data.filter_length // 2 + 1))).astype(np.float32))
        np.save(d / "a.pit.npy", rng.uniform(100, 400, frames + 1).astype(np.float32))
        # 320-hop features get x2 repeated at load -> store half+2 frames
        half = frames // 2 + 2
        np.save(d / "a.vec.npy", rng.standard_normal((half, hp.vits.vec_dim)).astype(np.float32))
        np.save(d / "a.ppg.npy", rng.standard_normal((half, hp.vits.ppg_dim)).astype(np.float32))
        np.save(d / "a.spk.npy", rng.standard_normal(hp.vits.spk_dim).astype(np.float32))
        rows.append("|".join([
            str(d / "a.wav"), str(d / "a.spec.npy"), str(d / "a.pit.npy"),
            str(d / "a.vec.npy"), str(d / "a.ppg.npy"), str(d / "a.spk.npy"),
        ]))
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(rows))
    return tmp_path, fl, hp


@pytest.fixture
def data_dir(tmp_path, rng):
    return _make_data(tmp_path, rng, tiny_hp())


def test_dataset_and_batcher(data_dir, rng):
    tmp_path, fl, hp = data_dir
    ds = SvcDataset(str(fl), hp.data)
    assert len(ds) > 0
    ex = ds.get(0, rng)
    t = ex["ppg"].shape[0]
    assert ex["vec"].shape[0] == t and ex["pit"].shape[0] == t
    assert ex["spec"].shape[0] == t
    assert len(ex["audio"]) == t * hp.data.hop_length

    batcher = BucketBatcher(ds, batch_size=2, boundaries=(32, 64, 96, 128, 160))
    batches = list(batcher.epoch_batches(0))
    assert batches, "no batches produced"
    for b in batches:
        t_pad = b["ppg"].shape[1]
        assert t_pad in (64, 96, 128)  # bucket upper bounds (max_frames=128)
        assert b["audio"].shape[1] == t_pad * hp.data.hop_length
        assert (b["ppg_l"] <= t_pad).all()
        # pad tails must be zero (collate fills np.empty + zeroes the tail;
        # a hole here would leak uninitialized memory into the loss masks)
        for i in range(b["ppg"].shape[0]):
            t = int(b["ppg_l"][i])
            for key in ("ppg", "vec", "pit", "spec"):
                assert np.all(b[key][i, t:] == 0.0), key
            assert np.all(b["audio"][i, t * hp.data.hop_length:] == 0.0)
    # epoch-seeded shuffle is deterministic
    b0 = list(batcher.epoch_batches(3))
    b1 = list(batcher.epoch_batches(3))
    np.testing.assert_array_equal(b0[0]["ppg_l"], b1[0]["ppg_l"])


def test_long_utterance_cropped_into_top_bucket(tmp_path, rng):
    """At BASE dims (hop 320, segment 8000 -> 25 frames, boundaries
    150/300/450), an out-of-range >4 s utterance is CROPPED to the 4 s cap
    (400 frames) and lands in the top (300, 450] bucket — not silently
    dropped by bucketing. Matches the reference's crop-at-load policy
    (vits/data_utils.py:30-31,107-119; boundaries dataloader.py:13)."""
    from whisper_vits_svc_tpu.data.dataset import boundaries_for
    from whisper_vits_svc_tpu.utils.config import load_config

    hp = load_config(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "base.yaml"))
    hop, sr = hp.data.hop_length, hp.data.sampling_rate
    assert (hop, hp.data.segment_size) == (320, 8000)
    frames = 600  # 6 s at 100 fps — beyond the top 450 boundary if uncropped
    d = tmp_path
    wav = (rng.standard_normal(frames * hop) * 0.1).astype(np.float32)
    save_wav(str(d / "a.wav"), wav, sr)
    np.save(d / "a.spec.npy", np.abs(rng.standard_normal(
        (frames, hp.data.filter_length // 2 + 1))).astype(np.float32))
    np.save(d / "a.pit.npy", rng.uniform(100, 400, frames + 1).astype(np.float32))
    half = frames // 2 + 2
    np.save(d / "a.vec.npy",
            rng.standard_normal((half, hp.vits.vec_dim)).astype(np.float32))
    np.save(d / "a.ppg.npy",
            rng.standard_normal((half, hp.vits.ppg_dim)).astype(np.float32))
    np.save(d / "a.spk.npy",
            rng.standard_normal(hp.vits.spk_dim).astype(np.float32))
    fl = d / "train.txt"
    fl.write_text("|".join([
        str(d / "a.wav"), str(d / "a.spec.npy"), str(d / "a.pit.npy"),
        str(d / "a.vec.npy"), str(d / "a.ppg.npy"), str(d / "a.spk.npy"),
    ]))

    ds = SvcDataset(str(fl), hp.data)
    assert len(ds) == 1, "out-of-range utterance must be kept (cropped)"
    assert ds.items[0].frames == 400  # 4 s cap == 16 * 25-frame segments

    batcher = BucketBatcher(ds, batch_size=1,
                            boundaries=boundaries_for(hp.data))
    assert sum(len(b) for b in batcher.buckets) == 1, "must land in a bucket"
    batches = list(batcher.epoch_batches(0))
    assert len(batches) == 1
    b = batches[0]
    assert b["ppg"].shape == (1, 400, hp.vits.ppg_dim)
    assert b["audio"].shape == (1, 400 * hop, 1)
    assert int(b["ppg_l"][0]) == 400
    # content, not zero-padding, fills the batch to the cap
    assert np.abs(b["ppg"][0, 399]).max() > 0
    assert np.abs(b["audio"][0, -hop:]).max() > 0


def _nan_inject_setup(tmp_path, rng, monkeypatch, poison_call: int):
    """Micro training setup whose `poison_call`-th batch is poisoned with NaN
    (injected at the host shard_batch boundary — the deterministic stand-in
    for VERDICT r4 #6's 'scale D lr until NaN'). Returns (hp, data_dir,
    set_poison) — set_poison(n) re-targets which call gets poisoned."""
    import whisper_vits_svc_tpu.train.loop as loop_mod
    from whisper_vits_svc_tpu.utils.testing import micro_hp

    tmp_path_, fl, hp = _make_data(tmp_path, rng, micro_hp())
    hp["data"]["training_files"] = str(fl)
    hp["data"]["validation_files"] = str(fl)
    hp["train"]["pretrain"] = ""
    hp["train"]["epochs"] = 10000
    hp["log"] = dict(info_interval=1, eval_interval=10000, save_interval=1,
                     num_audio=0, pth_dir=str(tmp_path_ / "chkpt"),
                     log_dir=str(tmp_path_ / "logs"), keep_ckpts=0)
    hp["dist"] = dict(coordinator_address=None, num_processes=1, process_id=0)

    state = {"n": 0, "poison": poison_call}
    orig_shard = loop_mod.pmesh.shard_batch

    def inject(batch, mesh):
        state["n"] += 1
        if state["n"] == state["poison"]:
            batch = dict(batch)
            batch["ppg"] = np.full_like(batch["ppg"], np.nan)
        return orig_shard(batch, mesh)

    monkeypatch.setattr(loop_mod.pmesh, "shard_batch", inject)

    def set_poison(n):
        state["poison"] = n

    return hp, tmp_path_, set_poison


@pytest.mark.slow
def test_nan_guard_halts_without_autoresume(tmp_path, rng, monkeypatch):
    """Divergence before any checkpoint: the guard halts with the last
    healthy step surfaced and writes NO checkpoint (VERDICT r4 #6)."""
    from whisper_vits_svc_tpu.train.loop import TrainDivergence, train

    hp, tmp_path_, _ = _nan_inject_setup(tmp_path, rng, monkeypatch,
                                         poison_call=2)
    with pytest.raises(TrainDivergence) as exc_info:
        train(hp, "t", max_epochs=2, max_steps=6)
    assert exc_info.value.last_healthy_step == 1
    assert exc_info.value.step == 2
    ckpt_dir = os.path.join(str(tmp_path_ / "chkpt"), "t")
    assert not os.path.isdir(ckpt_dir) or not os.listdir(ckpt_dir), (
        "no checkpoint may be written past a divergence")


@pytest.mark.slow
def test_nan_guard_autoresumes_from_checkpoint(tmp_path, rng, monkeypatch,
                                               capsys):
    """Divergence after a healthy epoch: flag-gated auto-resume restores the
    last checkpoint, scales the LR down, and training completes."""
    import jax

    from whisper_vits_svc_tpu.data.dataset import boundaries_for
    from whisper_vits_svc_tpu.train.loop import train

    hp, tmp_path_, set_poison = _nan_inject_setup(tmp_path, rng, monkeypatch,
                                                  poison_call=10**9)
    # count the batches one epoch produces (bucket padding makes it more
    # than items/batch_size), so the poison lands on epoch 2's FIRST batch —
    # i.e. after epoch 1's checkpoint exists
    ds = SvcDataset(hp.data.training_files, hp.data)
    batcher = BucketBatcher(ds, hp.train.batch_size,
                            boundaries=boundaries_for(hp.data),
                            seed=hp.train.seed)
    n_per_epoch = len(list(batcher.epoch_batches(1)))
    assert n_per_epoch == len(list(batcher.epoch_batches(2)))
    set_poison(n_per_epoch + 1)
    hp["train"]["nan_autoresume"] = True
    hp["train"]["nan_lr_factor"] = 0.5
    # epoch 1 = n healthy steps + checkpoint; epoch 2's first batch is
    # poisoned -> detected at step n+1 -> auto-resume to step n / epoch 1;
    # the re-run epoch 1 and epoch 2 are clean -> final counter 3n
    g_state, d_state, step = train(hp, "t", max_epochs=2, max_steps=10**9)
    assert step == 3 * n_per_epoch
    out = capsys.readouterr().out
    assert "auto-resumed" in out
    for leaf in jax.tree.leaves(g_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    ckpts = os.listdir(os.path.join(str(tmp_path_ / "chkpt"), "t"))
    assert any(f.endswith(".ckpt") for f in ckpts)


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path, rng):
    from whisper_vits_svc_tpu.train.loop import train
    from whisper_vits_svc_tpu.utils.testing import micro_hp

    tmp_path_, fl, hp = _make_data(tmp_path, rng, micro_hp())
    hp["data"]["training_files"] = str(fl)
    hp["data"]["validation_files"] = str(fl)
    hp["train"]["pretrain"] = ""
    hp["train"]["epochs"] = 10000
    hp["log"] = dict(info_interval=2, eval_interval=10000, save_interval=1,
                     num_audio=0, pth_dir=str(tmp_path_ / "chkpt"),
                     log_dir=str(tmp_path_ / "logs"), keep_ckpts=2)
    hp["dist"] = dict(coordinator_address=None, num_processes=1, process_id=0)

    g_state, d_state, step = train(hp, "t", max_epochs=1, max_steps=3)
    assert step == 3

    ckpts = os.listdir(os.path.join(str(tmp_path_ / "chkpt"), "t"))
    assert any(f.endswith(".ckpt") for f in ckpts)

    # resume restores step/epoch and params load back exactly
    path = os.path.join(str(tmp_path_ / "chkpt"), "t", sorted(ckpts)[-1])
    payload = ckpt.load(path)
    assert payload["step"] == 3
    import jax

    from whisper_vits_svc_tpu.train.step import init_train_states

    g2, d2, *_ = init_train_states(hp, jax.random.PRNGKey(0))
    g2, d2, step2, epoch2 = ckpt.restore_states(g2, d2, payload)
    np.testing.assert_allclose(
        jax.tree.leaves(g2.params)[0],
        np.asarray(jax.tree.leaves(g_state.params)[0]), rtol=1e-6,
    )

    # inference export drops posterior/classifier branches
    export_path = str(tmp_path_ / "export.ckpt")
    ckpt.export_inference(export_path, g_state.params)
    exported = ckpt.load(export_path)["model_g"]
    assert "enc_q" not in exported and "enc_p" in exported and "dec" in exported
