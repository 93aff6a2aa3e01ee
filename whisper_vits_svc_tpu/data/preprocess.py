"""Unified preprocessing driver — replaces the 10 subprocess stages.

The reference shells out to 10 sequential python processes
(svc_preprocessing.py:14-25), each reloading its model. Here one driver runs
idempotent stages over the same `data_svc/` cache layout (skip-if-exists like
prepare/preprocess_ppg.py:69-70 gives restartability), with the heavy
extractors batched on-device:

  dataset_raw/<speaker>/*.wav
    -> data_svc/waves-16k/<spk>/*.wav      (peak-0.6 int16, preprocess_a.py)
    -> data_svc/waves-32k/<spk>/*.wav
    -> data_svc/pitch/<spk>/*.pit.npy      (crepe full, hop 160)
    -> data_svc/whisper/<spk>/*.ppg.npy    (24-layer large-v2, [T,1280])
    -> data_svc/hubert/<spk>/*.vec.npy     ([T,256])
    -> data_svc/speaker/<spk>/*.spk.npy    (256-d d-vector per utterance)
    -> data_svc/singer/<spk>.spk.npy       (per-speaker mean)
    -> data_svc/specs/<spk>/*.spec.npy     (linear spec [T,513] @32k hop 320)
  files/train.txt, files/valid.txt         (existence-checked rows)
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..ops.stft import linear_spectrogram
from ..utils.audio_io import load_wav, save_wav


def list_raw_wavs(dataset_raw: str) -> dict[str, list[str]]:
    """speaker -> wav paths (prepare/preprocess_a.py directory convention)."""
    out = {}
    for spk in sorted(os.listdir(dataset_raw)):
        d = os.path.join(dataset_raw, spk)
        if os.path.isdir(d):
            wavs = sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".wav")
            )
            if wavs:
                out[spk] = wavs
    return out


@dataclass
class Extractors:
    """Injectable model bundle; any None skips its stage (checkpoints are
    external artifacts, reference *_pretrain/README.md)."""

    crepe: tuple | None = None            # (model, params)
    whisper: tuple | None = None
    hubert: tuple | None = None
    speaker: tuple | None = None


def _ensure(path):
    os.makedirs(path, exist_ok=True)
    return path


def preprocess(
    dataset_raw: str,
    out_dir: str = "data_svc",
    files_dir: str = "files",
    hp_data=None,
    extractors: Extractors | None = None,
    valid_count: int = 10,
    seed: int = 1234,
    progress: bool = True,
) -> dict:
    extractors = extractors or Extractors()
    speakers = list_raw_wavs(dataset_raw)
    stats = {"items": 0, "skipped": 0}
    sr32 = 32000 if hp_data is None else hp_data.sampling_rate
    n_fft = 1024 if hp_data is None else hp_data.filter_length
    hop = 320 if hp_data is None else hp_data.hop_length
    win = 1024 if hp_data is None else hp_data.win_length

    def log(msg):
        if progress:
            print(msg)

    for spk, wavs in speakers.items():
        for sub in ["waves-16k", "waves-32k", "pitch", "whisper", "hubert",
                    "speaker", "specs"]:
            _ensure(os.path.join(out_dir, sub, spk))
        _ensure(os.path.join(out_dir, "singer"))

        for wav_path in wavs:
            name = os.path.splitext(os.path.basename(wav_path))[0]
            stats["items"] += 1

            p16 = os.path.join(out_dir, "waves-16k", spk, name + ".wav")
            p32 = os.path.join(out_dir, "waves-32k", spk, name + ".wav")
            if not os.path.isfile(p16) or not os.path.isfile(p32):
                from ..utils.audio_io import resample

                audio, src_sr = load_wav(wav_path)
                save_wav(p16, resample(audio, src_sr, 16000), 16000, peak_norm=0.6)
                save_wav(p32, resample(audio, src_sr, sr32), sr32, peak_norm=0.6)

            a16, _ = load_wav(p16)
            a32, _ = load_wav(p32)

            pit_path = os.path.join(out_dir, "pitch", spk, name + ".pit.npy")
            if extractors.crepe is not None and not os.path.isfile(pit_path):
                from ..models.crepe import compute_f0

                m, p = extractors.crepe
                np.save(pit_path, compute_f0(m, p, a16,
                                             np.random.default_rng(seed)),
                        allow_pickle=False)

            ppg_path = os.path.join(out_dir, "whisper", spk, name + ".ppg.npy")
            if extractors.whisper is not None and not os.path.isfile(ppg_path):
                from ..models.whisper import pred_ppg

                m, p = extractors.whisper
                np.save(ppg_path, pred_ppg(m, p, a16, rng=None), allow_pickle=False)

            vec_path = os.path.join(out_dir, "hubert", spk, name + ".vec.npy")
            if extractors.hubert is not None and not os.path.isfile(vec_path):
                from ..models.hubert import pred_vec

                m, p = extractors.hubert
                np.save(vec_path, pred_vec(m, p, a16), allow_pickle=False)

            spk_path = os.path.join(out_dir, "speaker", spk, name + ".spk.npy")
            if extractors.speaker is not None and not os.path.isfile(spk_path):
                from ..models.speaker_encoder import compute_embedding

                m, p = extractors.speaker
                np.save(spk_path, compute_embedding(m, p, a16), allow_pickle=False)

            spec_path = os.path.join(out_dir, "specs", spk, name + ".spec.npy")
            if not os.path.isfile(spec_path):
                spec = np.asarray(
                    linear_spectrogram(jnp.asarray(a32)[None], n_fft, hop, win)
                )[0]
                np.save(spec_path, spec.astype(np.float32), allow_pickle=False)

        # per-speaker average embedding (prepare/preprocess_speaker_ave.py)
        singer_path = os.path.join(out_dir, "singer", spk + ".spk.npy")
        embeds = [
            np.load(os.path.join(out_dir, "speaker", spk, f))
            for f in sorted(os.listdir(os.path.join(out_dir, "speaker", spk)))
            if f.endswith(".spk.npy")
        ]
        if embeds and not os.path.isfile(singer_path):
            np.save(singer_path, np.mean(embeds, axis=0), allow_pickle=False)
        log(f"speaker {spk}: {len(wavs)} items done")

    rows = build_filelists(out_dir, files_dir, valid_count, seed)
    stats["rows"] = len(rows)
    return stats


def cut_direct_content(audio: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    """Zero the DC and first STFT bins, resynthesize (CDC VCTK cleanup,
    reference prepare/preprocess_cdc.py:17-28).

    float [-1, 1] in -> float in; the int16 quantization with torch-style
    truncation toward zero (`.short()`) happens in `cdc_directory`.
    """
    import jax.numpy as jnp

    from ..ops.stft import istft, stft_complex

    y = jnp.asarray(audio, jnp.float32)[None]
    re, im = stft_complex(y, n_fft, hop, n_fft, window="hann", center=True,
                          pad_mode="reflect")
    mask = np.ones(n_fft // 2 + 1, np.float32)
    mask[0] = mask[1] = 0.0
    out = istft(re * mask, im * mask, n_fft, hop, n_fft, center=True,
                length=len(audio))
    return np.asarray(out[0])


def _quantize_int16_trunc(audio: np.ndarray) -> np.ndarray:
    """32768*x clamped to [-32768, 32767] then truncated toward zero — the
    exact `(MAX_WAV_VALUE*x).clamp(...).short()` of preprocess_cdc.py:23-25."""
    x = np.clip(audio * 32768.0, -32768.0, 32767.0)
    return np.trunc(x).astype(np.int16)


def detect_silence_ms(audio: np.ndarray, sr: int, min_silence_len: int = 200,
                      silence_thresh: float = -45.0) -> list[list[int]]:
    """Silent [start_ms, end_ms) ranges, pydub.silence.detect_silence
    semantics (1 ms seek step; a window is silent when its RMS dBFS — relative
    to int16 full scale — is below the threshold)."""
    n_ms = int(len(audio) // (sr // 1000))
    if n_ms < min_silence_len:
        return []
    spms = sr // 1000
    # per-ms energy prefix sum -> O(1) windowed RMS
    e = (audio[: n_ms * spms].astype(np.float64) ** 2).reshape(n_ms, spms).sum(1)
    cum = np.concatenate([[0.0], np.cumsum(e)])
    win_e = cum[min_silence_len:] - cum[:-min_silence_len]  # per start ms
    rms = np.sqrt(win_e / (min_silence_len * spms))
    thresh_lin = 10.0 ** (silence_thresh / 20.0)
    silent = rms < thresh_lin

    ranges: list[list[int]] = []
    start = None
    for i, s in enumerate(silent):
        if s and start is None:
            start = i
        elif not s and start is not None:
            ranges.append([start, i - 1 + min_silence_len])
            start = None
    if start is not None:
        ranges.append([start, len(silent) - 1 + min_silence_len])
    return ranges


def split_on_silence(audio: np.ndarray, sr: int, min_silence_len: int = 200,
                     silence_thresh: float = -45.0,
                     keep_silence: int = 200) -> list[np.ndarray]:
    """Non-silent chunks each padded with keep_silence ms, pydub
    split_on_silence semantics (overlapping pads split at the midpoint)."""
    n_ms = int(len(audio) // (sr // 1000))
    silence = detect_silence_ms(audio, sr, min_silence_len, silence_thresh)
    # complement -> nonsilent ranges
    nonsilent, prev = [], 0
    for s, e in silence:
        if s > prev:
            nonsilent.append([prev, s])
        prev = e
    if prev < n_ms:
        nonsilent.append([prev, n_ms])
    if not nonsilent:
        return []
    out_ranges = [[max(0, s - keep_silence), min(n_ms, e + keep_silence)]
                  for s, e in nonsilent]
    for a, b in zip(out_ranges, out_ranges[1:]):
        if a[1] > b[0]:
            a[1] = b[0] = (a[1] + b[0]) // 2
    spms = sr // 1000
    return [audio[s * spms : e * spms] for s, e in out_ranges]


def trim_silence_concat(audio: np.ndarray, sr: int, min_silence_len: int = 200,
                        silence_thresh: float = -45.0,
                        keep_silence: int = 200) -> np.ndarray:
    """Drop long internal silences and concatenate the speech chunks —
    reference prepare/preprocess_trim.py:12-25 (pydub split_on_silence then
    chunks[0] += chunk). Returns the input untouched when nothing is split."""
    chunks = split_on_silence(audio, sr, min_silence_len, silence_thresh,
                              keep_silence)
    if not chunks:
        return audio
    return np.concatenate(chunks)


def _per_speaker_wavs(in_path: str, out_path: str):
    for spk in sorted(os.listdir(in_path)):
        d = os.path.join(in_path, spk)
        if not os.path.isdir(d):
            continue
        _ensure(os.path.join(out_path, spk))
        for f in sorted(os.listdir(d)):
            if f.endswith(".wav"):
                yield spk, os.path.join(d, f), os.path.join(out_path, spk, f)


def cdc_directory(in_path: str, out_path: str, progress: bool = True) -> int:
    """CDC over a speaker-per-subdir tree (prepare/preprocess_cdc.py CLI)."""
    from scipy.io import wavfile

    n = 0
    for spk, src, dst in _per_speaker_wavs(in_path, out_path):
        audio, sr = load_wav(src)
        wavfile.write(dst, sr, _quantize_int16_trunc(cut_direct_content(audio)))
        n += 1
        if progress:
            print(f"cdc {spk}/{os.path.basename(src)}")
    return n


def trim_directory(in_path: str, out_path: str, progress: bool = True) -> int:
    """Silence-trim over a speaker-per-subdir tree (prepare/preprocess_trim.py
    CLI; run after CDC for VCTK)."""
    from scipy.io import wavfile

    n = 0
    for spk, src, dst in _per_speaker_wavs(in_path, out_path):
        audio, sr = load_wav(src)
        wavfile.write(dst, sr, _quantize_int16_trunc(trim_silence_concat(audio, sr)))
        n += 1
        if progress:
            print(f"trim {spk}/{os.path.basename(src)}")
    return n


def dataset_dry_run(hp, files_dir: str = "files", batch_size: int = 2) -> int:
    """Iterate the full dataset + one bucketed epoch so shape/file errors
    surface before training (reference prepare/preprocess_zzz.py:11-31,
    stage 10 of svc_preprocessing). Returns the number of batches."""
    import numpy as np

    from .dataset import BucketBatcher, SvcDataset, boundaries_for

    ds = SvcDataset(os.path.join(files_dir, "train.txt"), hp)
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        ex = ds.get(i, rng)
        t = ex["ppg"].shape[0]
        assert ex["vec"].shape[0] == t and ex["spec"].shape[0] == t, i
        assert len(ex["audio"]) == t * hp.hop_length, i
    batcher = BucketBatcher(ds, batch_size, boundaries=boundaries_for(hp))
    n = 0
    for batch in batcher.epoch_batches(0):
        assert np.isfinite(batch["ppg"]).all()
        n += 1
    print(f"dataset dry-run ok: {len(ds)} items, {n} batches")
    return n


def build_filelists(out_dir: str, files_dir: str, valid_count: int = 10,
                    seed: int = 1234) -> list[str]:
    """Existence-checked train/valid rows (prepare/preprocess_train.py:33-68):
    "wave|spec|pitch|hubert|whisper|spk"."""
    rows = []
    wav_root = os.path.join(out_dir, "waves-32k")
    if not os.path.isdir(wav_root):
        return rows
    for spk in sorted(os.listdir(wav_root)):
        for f in sorted(os.listdir(os.path.join(wav_root, spk))):
            if not f.endswith(".wav"):
                continue
            name = f[:-4]
            paths = [
                os.path.join(out_dir, "waves-32k", spk, f),
                os.path.join(out_dir, "specs", spk, name + ".spec.npy"),
                os.path.join(out_dir, "pitch", spk, name + ".pit.npy"),
                os.path.join(out_dir, "hubert", spk, name + ".vec.npy"),
                os.path.join(out_dir, "whisper", spk, name + ".ppg.npy"),
                os.path.join(out_dir, "speaker", spk, name + ".spk.npy"),
            ]
            missing = [p for p in paths if not os.path.isfile(p)]
            if missing:
                print(f"\033[31mmissing {missing[0]} — skipping {name}\033[0m")
                continue
            rows.append("|".join(paths))
    random.Random(seed).shuffle(rows)
    os.makedirs(files_dir, exist_ok=True)
    # hold out at most half the data so tiny datasets keep a disjoint train set
    # (the reference assumes >10 items and would leave train empty below that)
    valid_count = min(valid_count, len(rows) // 2)
    valid = rows[:valid_count]
    train = rows[valid_count:]
    with open(os.path.join(files_dir, "valid.txt"), "w") as f:
        f.write("\n".join(valid) + ("\n" if valid else ""))
    with open(os.path.join(files_dir, "train.txt"), "w") as f:
        f.write("\n".join(train) + ("\n" if train else ""))
    return rows
