"""Unified preprocessing driver — replaces the 10 subprocess stages.

The reference shells out to 10 sequential python processes
(svc_preprocessing.py:14-25), each reloading its model, and thread-pools only
the host stages (prepare/preprocess_a.py:23-30, preprocess_spec.py:36,
preprocess_f0.py:34). Here one driver runs idempotent stages over the same
`data_svc/` cache layout (skip-if-exists like prepare/preprocess_ppg.py:69-70
gives restartability), TPU-shaped (SURVEY.md §7.4):

  * stage-major: each extractor's compiled program stays resident while the
    whole dataset streams through it,
  * windows batched ACROSS utterances into fixed-size device batches
    (ppg_window_batch / vec_window_batch — one compiled program per
    extractor for the entire run),
  * host IO (wav reads, npy writes) overlapped with device compute via a
    producer thread (data/prefetch.py) and a writer pool.

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
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import linear_spectrogram, stft_magnitude
from ..utils.audio_io import load_wav, save_wav
from .prefetch import prefetch


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


@partial(jax.jit, static_argnums=(1, 2, 3))
def _spec_program(y, n_fft, hop, win):
    """Linear-spectrogram frames of an ALREADY vits-prepadded, zero-extended
    row [1, Lb] (reflect pad happens on host so the bucket's zero padding
    cannot change the reflection — real frames match linear_spectrogram of
    the natural length exactly)."""
    return stft_magnitude(y, n_fft, hop, win, center=False, mag_eps=1e-6)


def compute_spec_bucketed(a32: np.ndarray, n_fft: int, hop: int, win: int,
                          bucket_samples: int = 128000) -> np.ndarray:
    """[T] 32 kHz audio -> [frames, n_fft//2+1], one compiled program per
    4 s length bucket instead of one per utterance length (coarse buckets:
    the spec is one small matmul, a fresh compile through the TPU tunnel is
    orders of magnitude more expensive than 4 s of padded frames)."""
    pad = int((n_fft - hop) / 2)
    y = np.pad(a32.astype(np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    lb = -(-len(y) // bucket_samples) * bucket_samples
    y = np.pad(y, (0, lb - len(y)))
    spec = np.asarray(_spec_program(jnp.asarray(y)[None], n_fft, hop, win))[0]
    return spec[:n_frames].astype(np.float32)


def _cut_windows(audio: np.ndarray, window_samples: int):
    """[(row [window_samples] zero-padded, real_len)] — the reference's
    window walk (whisper/inference.py:36-52, hubert/inference.py:29-48:
    a window starts at every multiple of the window size below len)."""
    out = []
    for s in range(0, len(audio), window_samples):
        seg = audio[s : s + window_samples]
        row = np.zeros(window_samples, np.float32)
        row[: len(seg)] = seg
        out.append((row, len(seg)))
    return out


def _window_buckets(window_samples: int) -> list[int]:
    """Static row-size buckets {w/8, w/4, w/2, w} (rounded up to the 320-hop
    grid): a short utterance or tail runs in the smallest program that fits
    instead of padding to the full window — with length-masked extractors the
    result is the same, the FLOPs are 2-8x fewer."""
    out = []
    for div in (8, 4, 2, 1):
        b = -(-window_samples // div // 320) * 320
        if not out or b > out[-1]:
            out.append(b)
    return out


class _Inflight:
    """Bounded queue of dispatched-but-unharvested device batches.

    jax dispatch is asynchronous: `push` enqueues the device array for a
    batch and only materializes (np.asarray, which blocks) the OLDEST entry
    once more than `depth` are in flight — so the device computes batch N
    while the host packs/harvests around it. With the old dispatch-then-
    immediately-materialize flush, device busy time was bounded by one
    dispatch round-trip per batch (measured 0.041 busy fraction through the
    tunnel, VERDICT r4 weak #3); keeping `depth` batches in flight makes the
    driver robust to ANY dispatch latency, local or tunneled."""

    def __init__(self, depth: int = 2):
        from collections import deque

        self.q = deque()
        self.depth = max(1, depth)

    def push(self, device_out, harvest):
        """harvest(np_out) is called when this batch is materialized."""
        self.q.append((device_out, harvest))
        while len(self.q) > self.depth:
            self._pop()

    def _pop(self):
        device_out, harvest = self.q.popleft()
        harvest(np.asarray(device_out))

    def drain(self):
        while self.q:
            self._pop()


def _run_window_stage(pending, window_samples, batch_windows, run_batch,
                      frames_of_len, feat_dim, log, label,
                      inflight_depth: int = 2):
    """Stream utterances through a handful of fixed-shape batched device
    programs (one per size bucket).

    pending: [(a16_path, out_path)]. A producer thread loads audio and cuts
    windows; rows are packed ACROSS utterance boundaries into
    [batch_windows, bucket] batches (bucket = smallest of _window_buckets
    that fits the row); per-row outputs are truncated to
    frames_of_len(real_len) and reassembled per utterance. Device batches and
    host IO overlap (prefetch), and `inflight_depth` batches stay dispatched
    before the oldest is materialized (_Inflight), so the device never waits
    on a wav read OR a host round-trip. run_batch must return the
    un-materialized device array (as_numpy=False surfaces)."""
    if not pending:
        return

    buckets = _window_buckets(window_samples)

    def rows():
        for a16_path, out_path in pending:
            audio, _ = load_wav(a16_path)
            cuts = _cut_windows(audio, window_samples)
            utt = {"path": out_path, "n": len(cuts), "parts": [None] * len(cuts),
                   "done": 0}
            if not cuts:
                yield (utt, None, None, None)
                continue
            for wi, (row, ln) in enumerate(cuts):
                yield (utt, wi, row, ln)

    writer = ThreadPoolExecutor(max_workers=2)
    done_utts = 0

    def finish(utt):
        nonlocal done_utts
        feats = (np.concatenate(utt["parts"], axis=0) if utt["parts"]
                 else np.zeros((0, feat_dim), np.float32))
        writer.submit(np.save, utt["path"], feats, allow_pickle=False)
        done_utts += 1

    buf = {b: np.zeros((batch_windows, b), np.float32) for b in buckets}
    lens = {b: np.full((batch_windows,), b, np.int64) for b in buckets}
    slots: dict[int, list[tuple[dict, int]]] = {b: [] for b in buckets}
    inflight = _Inflight(inflight_depth)

    def flush(b):
        sl = slots[b]
        if not sl:
            return
        out_dev = run_batch(buf[b], lens[b])
        records, lens_snap = list(sl), lens[b].copy()

        def harvest(out, records=records, lens_snap=lens_snap):
            for i, (utt, wi) in enumerate(records):
                utt["parts"][wi] = out[i, : frames_of_len(int(lens_snap[i])), :]
                utt["done"] += 1
                if utt["done"] == utt["n"]:
                    finish(utt)

        inflight.push(out_dev, harvest)
        sl.clear()
        # Fresh buffers, NOT in-place zeroing: jax passes host numpy arrays
        # to the CPU backend with immutable-zero-copy semantics, so mutating
        # buf/lens while the async dispatch still references them corrupts
        # the in-flight batch (seen as a staged!=serial flake under load).
        buf[b] = np.zeros((batch_windows, b), np.float32)
        lens[b] = np.full((batch_windows,), b, np.int64)

    for utt, wi, row, ln in prefetch(rows(), depth=2 * batch_windows):
        if wi is None:  # zero-length audio
            finish(utt)
            continue
        b = next(bk for bk in buckets if ln <= bk)
        i = len(slots[b])
        buf[b][i, :ln] = row[:ln]
        lens[b][i] = ln
        slots[b].append((utt, wi))
        if len(slots[b]) == batch_windows:
            flush(b)
    for b in buckets:
        flush(b)
    inflight.drain()
    writer.shutdown(wait=True)
    log(f"{label}: {done_utts} utterances")


def preprocess(
    dataset_raw: str,
    out_dir: str = "data_svc",
    files_dir: str = "files",
    hp_data=None,
    extractors: Extractors | None = None,
    valid_count: int = 10,
    seed: int = 1234,
    progress: bool = True,
    batch_windows: int = 8,
    io_threads: int = 4,
    serial: bool = False,
    hubert_window_seconds: int = 20,
) -> dict:
    """Stage-major batched driver (default) or the round-3 per-utterance
    serial loop (serial=True — kept as the measured A/B baseline for
    tools/bench_prep.py)."""
    extractors = extractors or Extractors()
    speakers = list_raw_wavs(dataset_raw)
    # skipped = per-stage cache-hit counts (outputs that already existed and
    # were not recomputed — the idempotent-restart accounting, ADVICE r4 #4)
    stats = {"items": 0, "skipped": {}}
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
        stats["items"] += len(wavs)

    if serial:
        _preprocess_serial(speakers, out_dir, extractors, sr32, n_fft, hop,
                           win, seed, log, hubert_window_seconds,
                           skipped=stats["skipped"])
    else:
        _preprocess_staged(speakers, out_dir, extractors, sr32, n_fft, hop,
                           win, seed, log, batch_windows, io_threads,
                           hubert_window_seconds, skipped=stats["skipped"])

    # per-speaker average embedding (prepare/preprocess_speaker_ave.py)
    for spk, wavs in speakers.items():
        singer_path = os.path.join(out_dir, "singer", spk + ".spk.npy")
        spk_dir = os.path.join(out_dir, "speaker", spk)
        embeds = [
            np.load(os.path.join(spk_dir, f))
            for f in sorted(os.listdir(spk_dir)) if f.endswith(".spk.npy")
        ]
        if embeds and not os.path.isfile(singer_path):
            np.save(singer_path, np.mean(embeds, axis=0), allow_pickle=False)
        log(f"speaker {spk}: {len(wavs)} items done")

    rows = build_filelists(out_dir, files_dir, valid_count, seed)
    stats["rows"] = len(rows)
    return stats


def _stage_paths(speakers, out_dir):
    """[(spk, name, wav_path, p16, p32)] for every raw item."""
    out = []
    for spk, wavs in speakers.items():
        for wav_path in wavs:
            name = os.path.splitext(os.path.basename(wav_path))[0]
            out.append((
                spk, name, wav_path,
                os.path.join(out_dir, "waves-16k", spk, name + ".wav"),
                os.path.join(out_dir, "waves-32k", spk, name + ".wav"),
            ))
    return out


def _preprocess_staged(speakers, out_dir, extractors, sr32, n_fft, hop, win,
                       seed, log, batch_windows, io_threads,
                       hubert_window_seconds=20, skipped=None):
    items = _stage_paths(speakers, out_dir)
    skipped = skipped if skipped is not None else {}

    # ---- stage 1: resample, thread-pooled host work (preprocess_a.py:23-30)
    def _resample_one(item):
        _spk, _name, wav_path, p16, p32 = item
        if os.path.isfile(p16) and os.path.isfile(p32):
            return 1
        from ..utils.audio_io import resample

        audio, src_sr = load_wav(wav_path)
        save_wav(p16, resample(audio, src_sr, 16000), 16000, peak_norm=0.6)
        save_wav(p32, resample(audio, src_sr, sr32), sr32, peak_norm=0.6)
        return 0

    with ThreadPoolExecutor(max_workers=io_threads) as pool:
        skipped["resample"] = sum(pool.map(_resample_one, items))
    log(f"resample: {len(items)} items")

    def _pending(sub, suffix):
        pend = [
            (p16, os.path.join(out_dir, sub, spk, name + suffix))
            for spk, name, _w, p16, _p32 in items
            if not os.path.isfile(os.path.join(out_dir, sub, spk, name + suffix))
        ]
        skipped[sub] = len(items) - len(pend)
        return pend

    # ---- stage 2: crepe F0 (per-utterance trellis; IO prefetched; frames
    # grouped 2048/device-call — identical values, 4x fewer dispatches)
    if extractors.crepe is not None:
        from ..models.crepe import compute_f0

        m, p = extractors.crepe
        pend = _pending("pitch", ".pit.npy")

        def _load(pair):
            return pair[1], load_wav(pair[0])[0]

        n = 0
        for pit_path, a16 in prefetch(map(_load, pend), depth=4):
            np.save(pit_path,
                    compute_f0(m, p, a16, np.random.default_rng(seed),
                               batch_size=2048),
                    allow_pickle=False)
            n += 1
        log(f"pitch: {n} utterances")

    # ---- stage 3: whisper PPG, windows batched across utterances
    if extractors.whisper is not None:
        from ..models.whisper import (
            PPG_HOP, WINDOW_SAMPLES, ppg_window_batch,
        )

        m, p = extractors.whisper
        _run_window_stage(
            _pending("whisper", ".ppg.npy"), WINDOW_SAMPLES, batch_windows,
            lambda rows, lens: ppg_window_batch(m, p, rows, lens, rng=None,
                                                as_numpy=False),
            lambda ln: ln // PPG_HOP, m.n_state, log, "whisper ppg",
        )

    # ---- stage 4: hubert soft units, windows batched across utterances
    if extractors.hubert is not None:
        from ..models.hubert import hubert_num_frames, vec_window_batch

        m, p = extractors.hubert
        _run_window_stage(
            _pending("hubert", ".vec.npy"), hubert_window_seconds * 16000,
            batch_windows,
            lambda rows, lens: vec_window_batch(m, p, rows, lens,
                                                as_numpy=False),
            hubert_num_frames, 256, log, "hubert vec",
        )

    # ---- stage 5: speaker d-vectors — host-numpy mel frontend, embed
    # windows batched ACROSS utterances. Window length nf is padded up to a
    # small static bucket set (exact: causal LSTM + per-row last-real-frame
    # gather, see _spk_batch_program) and partial groups pad to
    # batch_windows, so the whole dataset compiles at most
    # len(_SPK_NF_BUCKETS) programs — not one per distinct (nf, group size)
    # pair (ADVICE r4 #2 compile churn).
    if extractors.speaker is not None:
        from ..models.speaker_encoder import (
            _spk_batch_program, speaker_melspectrogram, trim_silence,
        )

        m, p = extractors.speaker
        pend = _pending("speaker", ".spk.npy")

        def _mel_windows(pair):
            a16 = load_wav(pair[0])[0]
            mel = speaker_melspectrogram(trim_silence(a16))
            nf = min(250, max(mel.shape[0], 1))
            if mel.shape[0] == 0:
                mel = np.zeros((1, mel.shape[1]), np.float32)
            offsets = np.linspace(0, mel.shape[0] - nf, num=10).astype(int)
            return pair[1], np.stack([mel[o : o + nf] for o in offsets]), nf

        nf_buckets = (32, 64, 125, 250)
        groups: dict[int, list] = {}
        writer = ThreadPoolExecutor(max_workers=2)
        spk_inflight = _Inflight(2)
        n = 0

        def _flush_spk(b):
            grp = groups.pop(b, [])
            if not grp:
                return
            rows = np.zeros((batch_windows * 10, b, 80), np.float32)
            lens_row = np.full((batch_windows * 10,), b, np.int32)
            for i, (_pth, wins, nf) in enumerate(grp):
                rows[i * 10 : (i + 1) * 10, :nf] = wins
                lens_row[i * 10 : (i + 1) * 10] = nf
            embs_dev = _spk_batch_program(m, p, jnp.asarray(rows),
                                          batch_windows,
                                          jnp.asarray(lens_row))

            def harvest(embs, grp=grp):
                for (path, _w, _nf), e in zip(grp, embs):
                    writer.submit(np.save, path, e, allow_pickle=False)

            spk_inflight.push(embs_dev, harvest)

        for spk_path, wins, nf in prefetch(map(_mel_windows, pend), depth=8):
            b = next(bk for bk in nf_buckets if nf <= bk)
            groups.setdefault(b, []).append((spk_path, wins, nf))
            n += 1
            if len(groups[b]) == batch_windows:
                _flush_spk(b)
        for b in list(groups):
            _flush_spk(b)
        spk_inflight.drain()
        writer.shutdown(wait=True)
        log(f"speaker embed: {n} utterances")

    # ---- stage 6: linear specs — host reflect-pad, rows batched across
    # utterances per length bucket (one device call per batch)
    pend_spec = [
        (p32, os.path.join(out_dir, "specs", spk, name + ".spec.npy"))
        for spk, name, _w, _p16, p32 in items
        if not os.path.isfile(os.path.join(out_dir, "specs", spk,
                                           name + ".spec.npy"))
    ]
    skipped["specs"] = len(items) - len(pend_spec)

    def _prepad_32(pair):
        a32 = load_wav(pair[0])[0]
        pad = int((n_fft - hop) / 2)
        y = np.pad(a32.astype(np.float32), (pad, pad), mode="reflect")
        return pair[1], y, 1 + (len(y) - n_fft) // hop

    sgroups: dict[int, list] = {}
    swriter = ThreadPoolExecutor(max_workers=2)
    spec_inflight = _Inflight(2)
    n = 0

    def _flush_spec(lb):
        grp = sgroups.pop(lb, [])
        if not grp:
            return
        rows = np.zeros((len(grp), lb), np.float32)
        for i, (_pth, y, _nf) in enumerate(grp):
            rows[i, : len(y)] = y
        spec_dev = _spec_program(jnp.asarray(rows), n_fft, hop, win)

        def harvest(spec, grp=grp):
            for i, (pth, _y, nfr) in enumerate(grp):
                swriter.submit(np.save, pth, spec[i, :nfr].astype(np.float32),
                               allow_pickle=False)

        spec_inflight.push(spec_dev, harvest)

    bucket = 128000
    for spec_path, y, nfr in prefetch(map(_prepad_32, pend_spec), depth=8):
        lb = -(-len(y) // bucket) * bucket
        sgroups.setdefault(lb, []).append((spec_path, y, nfr))
        n += 1
        if len(sgroups[lb]) == batch_windows:
            _flush_spec(lb)
    for lb in list(sgroups):
        _flush_spec(lb)
    spec_inflight.drain()
    swriter.shutdown(wait=True)
    log(f"specs: {n} utterances")


def _preprocess_serial(speakers, out_dir, extractors, sr32, n_fft, hop, win,
                       seed, log, hubert_window_seconds=20, skipped=None):
    """Round-3 per-utterance loop: every stage for one wav before the next
    wav. Kept verbatim as the A/B baseline tools/bench_prep.py measures the
    staged driver against."""
    skipped = skipped if skipped is not None else {}

    def _skip(stage):
        skipped[stage] = skipped.get(stage, 0) + 1

    for spk, wavs in speakers.items():
        for wav_path in wavs:
            name = os.path.splitext(os.path.basename(wav_path))[0]

            p16 = os.path.join(out_dir, "waves-16k", spk, name + ".wav")
            p32 = os.path.join(out_dir, "waves-32k", spk, name + ".wav")
            if not os.path.isfile(p16) or not os.path.isfile(p32):
                from ..utils.audio_io import resample

                audio, src_sr = load_wav(wav_path)
                save_wav(p16, resample(audio, src_sr, 16000), 16000, peak_norm=0.6)
                save_wav(p32, resample(audio, src_sr, sr32), sr32, peak_norm=0.6)
            else:
                _skip("resample")

            a16, _ = load_wav(p16)
            a32, _ = load_wav(p32)

            pit_path = os.path.join(out_dir, "pitch", spk, name + ".pit.npy")
            if extractors.crepe is not None and os.path.isfile(pit_path):
                _skip("pitch")
            if extractors.crepe is not None and not os.path.isfile(pit_path):
                from ..models.crepe import compute_f0

                m, p = extractors.crepe
                np.save(pit_path, compute_f0(m, p, a16,
                                             np.random.default_rng(seed)),
                        allow_pickle=False)

            ppg_path = os.path.join(out_dir, "whisper", spk, name + ".ppg.npy")
            if extractors.whisper is not None and os.path.isfile(ppg_path):
                _skip("whisper")
            if extractors.whisper is not None and not os.path.isfile(ppg_path):
                from ..models.whisper import pred_ppg

                m, p = extractors.whisper
                np.save(ppg_path, pred_ppg(m, p, a16, rng=None), allow_pickle=False)

            vec_path = os.path.join(out_dir, "hubert", spk, name + ".vec.npy")
            if extractors.hubert is not None and os.path.isfile(vec_path):
                _skip("hubert")
            if extractors.hubert is not None and not os.path.isfile(vec_path):
                from ..models.hubert import pred_vec

                m, p = extractors.hubert
                np.save(vec_path,
                        pred_vec(m, p, a16,
                                 window_seconds=hubert_window_seconds),
                        allow_pickle=False)

            spk_path = os.path.join(out_dir, "speaker", spk, name + ".spk.npy")
            if extractors.speaker is not None and os.path.isfile(spk_path):
                _skip("speaker")
            if extractors.speaker is not None and not os.path.isfile(spk_path):
                from ..models.speaker_encoder import compute_embedding

                m, p = extractors.speaker
                np.save(spk_path, compute_embedding(m, p, a16), allow_pickle=False)

            spec_path = os.path.join(out_dir, "specs", spk, name + ".spec.npy")
            if os.path.isfile(spec_path):
                _skip("specs")
            if not os.path.isfile(spec_path):
                spec = np.asarray(
                    linear_spectrogram(jnp.asarray(a32)[None], n_fft, hop, win)
                )[0]
                np.save(spec_path, spec.astype(np.float32), allow_pickle=False)


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
