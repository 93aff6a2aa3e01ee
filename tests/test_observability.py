"""Writer/plotting/profiling/dry-run smoke tests."""

import os

import numpy as np

from whisper_vits_svc_tpu.train.plotting import (
    amplitude_to_db, plot_spectrogram_to_numpy, plot_waveform_to_numpy,
)
from whisper_vits_svc_tpu.train.writer import TrainWriter


def test_plotting_arrays(rng):
    wav = rng.standard_normal(1000).astype(np.float32)
    img = plot_waveform_to_numpy(wav)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    spec = np.abs(rng.standard_normal((100, 50))).astype(np.float32)
    img2 = plot_spectrogram_to_numpy(amplitude_to_db(spec))
    assert img2.ndim == 3
    db = amplitude_to_db(spec)
    assert db.max() <= 0.0 and db.min() >= -80.0


def test_writer_logs(tmp_path, rng):
    w = TrainWriter(str(tmp_path), 32000)
    w.log_training({"loss_g": 1.0, "loss_d": 2.0}, step=10)
    w.log_validation(0.5, step=10)
    w.log_audio("fake/0", rng.standard_normal(100).astype(np.float32), 10)
    spec = np.abs(rng.standard_normal((64, 20))).astype(np.float32)
    w.log_fig_audio(
        rng.standard_normal(500).astype(np.float32),
        rng.standard_normal(500).astype(np.float32), spec, spec, 0, 10,
    )
    w.close()
    lines = open(os.path.join(tmp_path, "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) == 2 and '"loss_g": 1.0' in lines[0]


def test_step_timer():
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.utils.profiling import StepTimer, annotate, trace

    t = StepTimer(window=3)
    for _ in range(5):
        t.start()
        x = jnp.ones(10) * 2
        t.stop(x)
    assert len(t.times) == 3 and t.mean > 0

    with trace(None):  # no-op path
        with annotate("region"):
            pass


def test_dataset_dry_run(tmp_path, rng):
    from whisper_vits_svc_tpu.data.preprocess import dataset_dry_run
    from whisper_vits_svc_tpu.utils.audio_io import save_wav
    from whisper_vits_svc_tpu.utils.testing import tiny_hp

    hp = tiny_hp()
    hop, sr = hp.data.hop_length, hp.data.sampling_rate
    rows = []
    for i in range(3):
        d = tmp_path / f"i{i}"
        d.mkdir()
        frames = 64
        save_wav(str(d / "a.wav"), rng.standard_normal(frames * hop) * 0.1, sr)
        np.save(d / "a.spec.npy", np.abs(rng.standard_normal(
            (frames, hp.data.filter_length // 2 + 1))).astype(np.float32))
        np.save(d / "a.pit.npy", rng.uniform(100, 400, frames + 1).astype(np.float32))
        np.save(d / "a.vec.npy", rng.standard_normal(
            (frames // 2 + 2, hp.vits.vec_dim)).astype(np.float32))
        np.save(d / "a.ppg.npy", rng.standard_normal(
            (frames // 2 + 2, hp.vits.ppg_dim)).astype(np.float32))
        np.save(d / "a.spk.npy", rng.standard_normal(hp.vits.spk_dim).astype(np.float32))
        rows.append("|".join(str(d / f"a.{ext}") for ext in
                             ["wav", "spec.npy", "pit.npy", "vec.npy", "ppg.npy", "spk.npy"]))
    files = tmp_path / "files"
    files.mkdir()
    (files / "train.txt").write_text("\n".join(rows))
    n = dataset_dry_run(hp.data, str(files), batch_size=2)
    assert n >= 1


def test_device_trace_parser(tmp_path):
    """device_ms_per_call: picks jit spans on non-CPU lanes, averages dur."""
    import gzip
    import json

    from whisper_vits_svc_tpu.utils.device_trace import device_ms_per_call

    trace = {"traceEvents": [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "Host CPU threads"}},
        # two device spans of the jit program: 3 ms and 5 ms (dur is in us)
        {"ph": "X", "pid": 1, "name": "jit_synth", "dur": 3000, "ts": 0},
        {"ph": "X", "pid": 1, "name": "jit_synth.1", "dur": 5000, "ts": 9000},
        # distractors: CPU-lane span with same name, other-name device span
        {"ph": "X", "pid": 2, "name": "jit_synth", "dur": 99999, "ts": 0},
        {"ph": "X", "pid": 1, "name": "fusion.123", "dur": 777, "ts": 100},
    ]}
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    assert device_ms_per_call(str(tmp_path), "jit_synth") == 4.0
    assert device_ms_per_call(str(tmp_path), "jit_train_step") is None
    assert device_ms_per_call(str(tmp_path / "nope"), "jit_synth") is None
