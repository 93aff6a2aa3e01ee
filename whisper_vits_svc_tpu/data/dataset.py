"""Training dataset + static-shape bucketed batching.

Re-design of the reference data pipeline (vits/data_utils.py:17-325,
vits_extend/dataloader.py:7-37) under the XLA constraint that every compiled
batch shape must be static:

  * items are filtered to [1 s, 4 s] usable frames (data_utils.py:30-31),
  * 320-hop whisper/hubert features are frame-repeated x2 to the 160-hop rate
    (data_utils.py:85-87) — done here at load,
  * each epoch, items are length-bucketed (boundaries as the reference's
    [150, 300, 450], dataloader.py:13) and every batch is zero-padded to its
    bucket's upper bound, so XLA compiles exactly one program per bucket
    instead of one per batch length,
  * per-replica sharding is rank::num_replicas inside each bucket
    (data_utils.py:289) with epoch-seeded shuffling.

Batches are numpy dicts in [B, T, C] layout, feeding mesh-sharded device puts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def load_filelist(path: str) -> list[list[str]]:
    with open(path, encoding="utf-8") as f:
        return [line.strip().split("|") for line in f if line.strip()]


def _load_array(path: str) -> np.ndarray:
    """npy (ours) or torch .pt (reference specs cache, data_utils.py:81)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".pt"):
        import torch

        return torch.load(path, map_location="cpu", weights_only=True).numpy()
    return np.load(path)


@dataclass
class SvcItem:
    wav: str
    spec: str
    pitch: str
    vec: str
    ppg: str
    spk: str
    frames: int   # usable length in 160-hop... (hop_length) frames


class SvcDataset:
    """File-backed dataset over the data_svc/ caches."""

    def __init__(self, filelist: str, hp_data, segment_frames_min_s: int = 4,
                 max_s: int = 16):
        self.hp = hp_data
        self.hop = hp_data.hop_length
        self.sr = hp_data.sampling_rate
        seg_frames = hp_data.segment_size // hp_data.hop_length
        self.min_frames = seg_frames * segment_frames_min_s    # 1 s (25*4)
        self.max_frames = seg_frames * max_s                   # 4 s (25*16)
        self.items: list[SvcItem] = []
        for row in load_filelist(filelist):
            wav, spec, pitch, vec, ppg, spk = row[:6]
            if not all(os.path.isfile(p) for p in row[:6]):
                continue
            usel = int(np.load(pitch, mmap_mode="r").shape[0]) - 1
            if usel < self.min_frames:
                continue
            usel = min(usel, self.max_frames)
            self.items.append(SvcItem(wav, spec, pitch, vec, ppg, spk, usel))
        self.lengths = [it.frames for it in self.items]

    def __len__(self):
        return len(self.items)

    def get(self, idx: int, rng: np.random.Generator | None = None) -> dict:
        """One example, randomly cropped to <= its usable length.

        The per-item reads (wav + 4-5 npys) go through the native C++
        thread-pooled loader when built (data/native_loader.py) — the
        batch-building thread is the serial producer feeding the async
        device step, so C++-side parallel IO (GIL released for the whole
        batch read) is what keeps the host off the critical path; numpy
        fallback otherwise."""
        from ..utils.audio_io import load_wav
        from . import native_loader as nl

        it = self.items[idx]
        npy_paths = [it.pitch, it.vec, it.ppg, it.spk]
        spec_is_npy = it.spec.endswith(".npy")
        if spec_is_npy:
            npy_paths.append(it.spec)
        loaded = nl.load_npy_batch(npy_paths)
        nat_wav = nl.load_wav_native(it.wav, sr_hint=self.sr)
        if nat_wav is not None:
            audio, sr = nat_wav
        else:
            audio, sr = load_wav(it.wav)
        assert sr == self.sr, f"{it.wav}: {sr} != {self.sr}"
        spec = (loaded[4] if spec_is_npy and loaded[4] is not None
                else _load_array(it.spec))
        if spec.shape[0] == self.hp.filter_length // 2 + 1:
            spec = spec.T  # reference layout [bins, T] -> ours [T, bins]

        def _npy(i, path):
            return loaded[i] if loaded[i] is not None else np.load(path)

        pit = _npy(0, it.pitch).astype(np.float32)
        vec = np.repeat(_npy(1, it.vec), 2, axis=0)   # 320-hop -> 160-hop x2
        ppg = np.repeat(_npy(2, it.ppg), 2, axis=0)
        spk = _npy(3, it.spk).astype(np.float32)

        len_min = min(pit.shape[0], vec.shape[0] - 2, ppg.shape[0] - 2,
                      spec.shape[0])
        pit, vec, ppg, spec = (
            pit[:len_min], vec[:len_min], ppg[:len_min], spec[:len_min]
        )
        audio = audio[: len_min * self.hop]

        use = it.frames
        if len_min > use:
            start = int(rng.integers(0, len_min - use)) if rng is not None else 0
            pit = pit[start : start + use]
            vec = vec[start : start + use]
            ppg = ppg[start : start + use]
            spec = spec[start : start + use]
            audio = audio[start * self.hop : (start + use) * self.hop]
        return dict(ppg=ppg.astype(np.float32), vec=vec.astype(np.float32),
                    pit=pit, spk=spk, spec=spec.astype(np.float32),
                    audio=audio.astype(np.float32))


DEFAULT_BOUNDARIES = (150, 300, 450)


def boundaries_for(hp_data) -> tuple[int, ...]:
    """Bucket boundaries scaled from the segment length.

    The reference hardcodes [150, 300, 450] frames (dataloader.py:13) for a
    25-frame segment; expressed as (6, 12, 18) segments it generalizes to any
    config (and the tiny test configs).
    """
    seg = hp_data.segment_size // hp_data.hop_length
    return tuple(seg * k for k in (6, 12, 18))


class BucketBatcher:
    """Epoch iterator yielding static-shaped padded numpy batches.

    Buckets by usable frames (reference DistributedBucketSampler semantics:
    items outside (b0, b_last] are dropped, epoch-seeded shuffle, pad-repeat to
    a multiple of the global batch, rank::replicas subsample), then pads every
    example to the bucket's upper boundary — one XLA program per bucket.
    """

    def __init__(self, dataset: SvcDataset, batch_size: int,
                 boundaries=DEFAULT_BOUNDARIES, num_replicas: int = 1,
                 rank: int = 0, seed: int = 1234):
        self.ds = dataset
        self.batch_size = batch_size
        self.boundaries = list(boundaries)
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.buckets = [[] for _ in range(len(self.boundaries) - 1)]
        for i, length in enumerate(dataset.lengths):
            for b in range(len(self.boundaries) - 1):
                if self.boundaries[b] < length <= self.boundaries[b + 1]:
                    self.buckets[b].append(i)
                    break

    def epoch_batches(self, epoch: int):
        rng = np.random.default_rng(self.seed + epoch)
        all_batches = []
        for b, bucket in enumerate(self.buckets):
            if not bucket:
                continue
            pad_to = min(self.boundaries[b + 1], self.ds.max_frames)
            ids = list(rng.permutation(len(bucket)))
            total = self.num_replicas * self.batch_size
            rem = (total - len(ids) % total) % total
            ids = ids + ids * (rem // max(len(ids), 1)) + ids[: rem % max(len(ids), 1)]
            ids = ids[self.rank :: self.num_replicas]
            for j in range(len(ids) // self.batch_size):
                chunk = [bucket[k] for k in ids[j * self.batch_size : (j + 1) * self.batch_size]]
                all_batches.append((chunk, pad_to))
        order = rng.permutation(len(all_batches))
        for k in order:
            chunk, pad_to = all_batches[int(k)]
            yield self._collate(chunk, pad_to, rng)

    def _collate(self, idxs: list[int], pad_frames: int, rng) -> dict:
        hop = self.ds.hop
        b = len(idxs)
        hp = self.ds.hp
        examples = [self.ds.get(i, rng) for i in idxs]
        ppg_dim = examples[0]["ppg"].shape[1]
        vec_dim = examples[0]["vec"].shape[1]
        spec_dim = examples[0]["spec"].shape[1]
        # np.empty + content-fill + zero only the pad tail: the full
        # np.zeros init wrote every byte twice (16 MB of ppg zeros per
        # base-config batch) on the serial producer thread
        out = dict(
            ppg=np.empty((b, pad_frames, ppg_dim), np.float32),
            vec=np.empty((b, pad_frames, vec_dim), np.float32),
            pit=np.empty((b, pad_frames), np.float32),
            spk=np.empty((b, examples[0]["spk"].shape[0]), np.float32),
            spec=np.empty((b, pad_frames, spec_dim), np.float32),
            audio=np.empty((b, pad_frames * hop, 1), np.float32),
            ppg_l=np.zeros((b,), np.int32),
            spec_l=np.zeros((b,), np.int32),
        )
        for i, ex in enumerate(examples):
            t = ex["ppg"].shape[0]
            for key in ("ppg", "vec", "pit", "spec"):
                out[key][i, :t] = ex[key]
                out[key][i, t:] = 0.0
            out["spk"][i] = ex["spk"]
            s = min(len(ex["audio"]), pad_frames * hop)
            out["audio"][i, :s, 0] = ex["audio"][:s]
            out["audio"][i, s:] = 0.0
            out["ppg_l"][i] = t
            out["spec_l"][i] = t
        return out

    def batches_per_epoch(self) -> int:
        n = 0
        for bucket in self.buckets:
            if not bucket:
                continue
            total = self.num_replicas * self.batch_size
            padded = ((len(bucket) + total - 1) // total) * total
            n += padded // self.num_replicas // self.batch_size
        return n
