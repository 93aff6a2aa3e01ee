"""Offline preprocessing throughput benchmark (VERDICT r3 next-round #1d).

Measures `preprocess()` — the svc_preprocessing driver — over a synthetic
>=50-utterance dataset with FULL-SIZE random-weight extractors (whisper
large-v2 24-layer / hubert-soft / crepe full / LSTM d-vector), in three modes:

  staged        stage-major, windows batched across utterances, IO prefetch
                (the shipped default)
  serial        per-utterance loop over the SAME hoisted one-compile
                extractor programs (preprocess(serial=True))
  serial_rejit  round-3 semantics reconstructed: a fresh @jax.jit closure per
                utterance per extractor + an eager natural-length tail — what
                the driver did before this round (models/whisper.py:181 et
                al., VERDICT r3 weak #1)

Reports utterances/s + audio-seconds/s per mode and, for the staged run, the
device-busy fraction from an xprof trace (device span time / stage wall).

Usage: python tools/bench_prep.py [--n-utts 50] [--modes staged,serial]
Reference cost centers: /root/reference/svc_preprocessing.py:14-25,
prepare/preprocess_a.py:23-30, preprocess_ppg.py, preprocess_hubert.py.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import tempfile
import time

import numpy as np


def make_dataset(root: str, n_utts: int, seed: int = 0,
                 lengths: list[float] | None = None) -> float:
    """Two speakers, lengths 3-12 s at 32 kHz. Returns total audio seconds."""
    from whisper_vits_svc_tpu.utils.audio_io import save_wav

    rng = np.random.default_rng(seed)
    total = 0.0
    for i in range(n_utts):
        spk = f"spk_{i % 2}"
        os.makedirs(os.path.join(root, spk), exist_ok=True)
        secs = (lengths[i % len(lengths)] if lengths
                else float(rng.uniform(3.0, 12.0)))
        total += secs
        t = np.arange(int(32000 * secs)) / 32000.0
        f0 = float(rng.uniform(120, 300))
        x = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        save_wav(os.path.join(root, spk, f"u{i:03d}.wav"), x, 32000)
    return total


def full_size_extractors(tiny: bool = False):
    """Random-weight, reference-dimension models (pretrained blobs are not in
    this image, .MISSING_LARGE_BLOBS — weights don't change the compute).
    tiny=True shrinks dims for CPU smoke runs."""
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.data.preprocess import Extractors
    from whisper_vits_svc_tpu.models.crepe import Crepe
    from whisper_vits_svc_tpu.models.hubert import HubertSoft
    from whisper_vits_svc_tpu.models.speaker_encoder import LSTMSpeakerEncoder
    from whisper_vits_svc_tpu.models.whisper import WhisperEncoder

    ex = Extractors()
    wm = (WhisperEncoder(n_state=64, n_head=4, n_layer=1) if tiny
          else WhisperEncoder())  # large-v2 dims, 24 layers
    ex.whisper = (wm, jax.jit(wm.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 1500, 80)))["params"])
    hm = HubertSoft(n_layers=1) if tiny else HubertSoft()
    ex.hubert = (hm, jax.jit(hm.init)(jax.random.PRNGKey(1),
                                      jnp.zeros((1, 32000)))["params"])
    cm = Crepe("tiny" if tiny else "full")
    ex.crepe = (cm, jax.jit(cm.init)(jax.random.PRNGKey(2),
                                     jnp.zeros((4, 1024)))["params"])
    sm = (LSTMSpeakerEncoder(proj_dim=16, lstm_dim=32, num_layers=1) if tiny
          else LSTMSpeakerEncoder())
    ex.speaker = (sm, jax.jit(sm.init)(jax.random.PRNGKey(3),
                                       jnp.zeros((1, 60, 80)))["params"])
    return ex


def _serial_rejit(raw: str, out_dir: str, ex) -> None:
    """Round-3 driver semantics: fresh jit closure per utterance, eager
    natural-length tails (reconstruction of the pre-fix entry points)."""
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.data.preprocess import (
        compute_spec_bucketed, list_raw_wavs, _ensure,
    )
    from whisper_vits_svc_tpu.models.crepe import (
        frame_audio, normalize_frames)
    from whisper_vits_svc_tpu.models import crepe as crepe_mod
    from whisper_vits_svc_tpu.models.speaker_encoder import compute_embedding
    from whisper_vits_svc_tpu.models.whisper import (
        WINDOW_SAMPLES, log_mel_spectrogram)
    from whisper_vits_svc_tpu.utils.audio_io import load_wav, resample, save_wav

    for spk, wavs in list_raw_wavs(raw).items():
        for sub in ["waves-16k", "waves-32k", "pitch", "whisper", "hubert",
                    "speaker", "specs"]:
            _ensure(os.path.join(out_dir, sub, spk))
        for wav_path in wavs:
            name = os.path.splitext(os.path.basename(wav_path))[0]
            audio, src_sr = load_wav(wav_path)
            a16 = resample(audio, src_sr, 16000)
            a32 = resample(audio, src_sr, 32000)
            save_wav(os.path.join(out_dir, "waves-16k", spk, name + ".wav"),
                     a16, 16000, peak_norm=0.6)
            save_wav(os.path.join(out_dir, "waves-32k", spk, name + ".wav"),
                     a32, 32000, peak_norm=0.6)

            # crepe with per-utterance jit closure
            cm, cp = ex.crepe

            @jax.jit
            def run_crepe(batch, cp=cp, cm=cm):
                return cm.apply({"params": cp}, normalize_frames(batch))

            frames = frame_audio(a16, 160)
            n = len(frames)
            pad = (-n) % 512
            frames = np.pad(frames, ((0, pad), (0, 0)))
            probs = np.concatenate(
                [np.asarray(run_crepe(jnp.asarray(frames[i : i + 512])))
                 for i in range(0, len(frames), 512)])[:n]
            # decode identical to the current path (host viterbi)
            minidx = crepe_mod.frequency_to_bins(50.0)
            maxidx = crepe_mod.frequency_to_bins(1000.0, np.ceil)
            masked = probs.copy()
            masked[:, :minidx] = -np.inf
            masked[:, maxidx:] = -np.inf
            exv = np.exp(masked - masked.max(axis=1, keepdims=True))
            soft = exv / exv.sum(axis=1, keepdims=True)
            bins = crepe_mod.viterbi_decode(soft)
            pitch = crepe_mod.cents_to_frequency(
                crepe_mod.bins_to_cents(bins, None)).astype(np.float32)
            np.save(os.path.join(out_dir, "pitch", spk, name + ".pit.npy"),
                    pitch, allow_pickle=False)

            # whisper: per-utterance jit for full windows, EAGER tail
            wm, wp = ex.whisper

            @jax.jit
            def run_ppg(mel, wp=wp, wm=wm):
                return wm.apply({"params": wp}, mel)

            audln = len(a16)
            n_full = audln // WINDOW_SAMPLES
            outs = []
            if n_full:
                chunks = a16[: n_full * WINDOW_SAMPLES].reshape(
                    n_full, WINDOW_SAMPLES)
                ppg = np.asarray(run_ppg(log_mel_spectrogram(jnp.asarray(chunks))))
                outs.append(ppg[:, : WINDOW_SAMPLES // 320, :].reshape(
                    -1, ppg.shape[-1]))
            rem = audln - n_full * WINDOW_SAMPLES
            if rem > 0:
                mel = log_mel_spectrogram(
                    jnp.asarray(a16[n_full * WINDOW_SAMPLES :])[None])
                outs.append(np.asarray(wm.apply({"params": wp}, mel))[0, : rem // 320])
            np.save(os.path.join(out_dir, "whisper", spk, name + ".ppg.npy"),
                    np.concatenate(outs, axis=0), allow_pickle=False)

            # hubert: per-utterance jit for full windows, EAGER tail
            hm, hp_ = ex.hubert

            @jax.jit
            def run_vec(wav, hp_=hp_, hm=hm):
                return hm.apply({"params": hp_}, wav)

            win = 20 * 16000
            outs, idx = [], 0
            while idx + win < len(a16):
                outs.append(np.asarray(
                    run_vec(jnp.asarray(a16[idx : idx + win])[None]))[0])
                idx += win
            if idx < len(a16):
                outs.append(np.asarray(
                    hm.apply({"params": hp_}, jnp.asarray(a16[idx:])[None]))[0])
            np.save(os.path.join(out_dir, "hubert", spk, name + ".vec.npy"),
                    np.concatenate(outs, axis=0), allow_pickle=False)

            sm, sp = ex.speaker
            np.save(os.path.join(out_dir, "speaker", spk, name + ".spk.npy"),
                    compute_embedding(sm, sp, a16), allow_pickle=False)
            np.save(os.path.join(out_dir, "specs", spk, name + ".spec.npy"),
                    compute_spec_bucketed(a32, 1024, 320, 1024),
                    allow_pickle=False)


def _device_busy_ms(trace_dir: str) -> float | None:
    """Total device-side jit-program time in an xprof trace."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    device_pids = {
        e["pid"] for e in trace.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "CPU" not in str(e.get("args", {}).get("name", ""))
    }
    spans = [e for e in trace.get("traceEvents", [])
             if e.get("ph") == "X" and e.get("pid") in device_pids
             and e.get("name", "").startswith("jit_")]
    if not spans:
        return None
    return sum(e["dur"] for e in spans) / 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-utts", type=int, default=50)
    ap.add_argument("--modes", default="staged,serial,serial_rejit")
    ap.add_argument("--batch-windows", type=int, default=8)
    ap.add_argument("--rejit-utts", type=int, default=10,
                    help="serial_rejit is run on only this many utterances "
                         "(its eager tails + per-utterance retraces are "
                         "minutes-per-utterance slow; throughput reported "
                         "per-utterance is still comparable)")
    ap.add_argument("--trace", action="store_true",
                    help="xprof-trace the staged run for device-busy fraction")
    ap.add_argument("--tiny", action="store_true",
                    help="small extractor dims (CPU smoke run)")
    args = ap.parse_args(argv)

    import jax

    from whisper_vits_svc_tpu.data.preprocess import preprocess
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    work = tempfile.mkdtemp(prefix="bench_prep_")
    raw = os.path.join(work, "dataset_raw")
    audio_seconds = make_dataset(raw, args.n_utts)
    # warmup set covering every whisper/hubert/spec size bucket: all
    # compiles happen outside the timed window
    warm_raw = os.path.join(work, "warm_raw")
    make_dataset(warm_raw, 6, seed=99, lengths=[1.5, 3.5, 5.5, 7.0, 11.9, 15.5])

    print(f"dataset: {args.n_utts} utts, {audio_seconds:.1f} audio-s; "
          f"backend {jax.default_backend()}", flush=True)
    ex = full_size_extractors(tiny=args.tiny)

    results = {}
    for mode in args.modes.split(","):
        out_dir = os.path.join(work, f"svc_{mode}")
        files_dir = os.path.join(work, f"files_{mode}")
        if mode == "staged":
            preprocess(warm_raw, os.path.join(work, "warm_staged"),
                       os.path.join(work, "warm_files"), None, ex,
                       progress=False, batch_windows=args.batch_windows)
            trace_dir = None
            if args.trace:
                trace_dir = tempfile.mkdtemp(prefix="prep_trace_")
                jax.profiler.start_trace(trace_dir)
            t0 = time.perf_counter()
            preprocess(raw, out_dir, files_dir, None, ex, progress=False,
                       batch_windows=args.batch_windows)
            dt = time.perf_counter() - t0
            if trace_dir:
                jax.profiler.stop_trace()
                busy = _device_busy_ms(trace_dir)
                if busy is not None:
                    results["staged_device_busy_fraction"] = round(
                        busy / 1e3 / dt, 3)
                shutil.rmtree(trace_dir, ignore_errors=True)
        elif mode == "serial":
            preprocess(warm_raw, os.path.join(work, "warm_serial"),
                       os.path.join(work, "warm_files_s"), None, ex,
                       progress=False, serial=True)
            t0 = time.perf_counter()
            preprocess(raw, out_dir, files_dir, None, ex, progress=False,
                       serial=True)
            dt = time.perf_counter() - t0
        elif mode == "serial_rejit":
            sub_raw = os.path.join(work, "raw_rejit")
            n_sub = 0
            sub_audio = 0.0
            for spk in sorted(os.listdir(raw)):
                os.makedirs(os.path.join(sub_raw, spk), exist_ok=True)
                for f in sorted(os.listdir(os.path.join(raw, spk))):
                    if n_sub < args.rejit_utts:
                        src = os.path.join(raw, spk, f)
                        shutil.copy(src, os.path.join(sub_raw, spk, f))
                        sub_audio += os.path.getsize(src) / 2 / 32000
                        n_sub += 1
            t0 = time.perf_counter()
            _serial_rejit(sub_raw, out_dir, ex)
            dt = time.perf_counter() - t0
            results[mode] = {
                "wall_s": round(dt, 2),
                "n_utts": n_sub,
                "utts_per_s": round(n_sub / dt, 3),
                "audio_s_per_s": round(sub_audio / dt, 2),
            }
            print(f"{mode}: {results[mode]}", flush=True)
            continue
        else:
            raise SystemExit(f"unknown mode {mode}")
        results[mode] = {
            "wall_s": round(dt, 2),
            "utts_per_s": round(args.n_utts / dt, 3),
            "audio_s_per_s": round(audio_seconds / dt, 2),
        }
        print(f"{mode}: {results[mode]}", flush=True)

    if "staged" in results and "serial" in results:
        results["staged_vs_serial"] = round(
            results["serial"]["wall_s"] / results["staged"]["wall_s"], 2)
    if "staged" in results and "serial_rejit" in results:
        results["staged_vs_serial_rejit"] = round(
            results["staged"]["utts_per_s"]
            / results["serial_rejit"]["utts_per_s"], 2)
    results["n_utts"] = args.n_utts
    results["audio_seconds"] = round(audio_seconds, 1)
    results["backend"] = jax.default_backend()
    results["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    print(json.dumps({"metric": "preprocessing_throughput", **results}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
