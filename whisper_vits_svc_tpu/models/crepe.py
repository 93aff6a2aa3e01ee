"""CREPE pitch tracker — conv stack + viterbi decode, TPU-native.

Faithful to the torchcrepe reference (crepe/model.py:14-134, core.py:539-700,
decode.py:55-80, convert.py:12-57, filter.py:10-134):

  * 6-layer Conv2d stack over 1024-sample windows, BatchNorm folded to
    affine scale/bias at load (inference-only), sigmoid over 360 bins
    (20 cents/bin),
  * window framing + per-frame mean/std normalization done batched on device,
  * banded-transition Viterbi over bin probabilities: the trellis runs as a
    lax.scan on device (the reference loops librosa's python viterbi per
    utterance on CPU, decode.py:72-75); backtrace on host,
  * cents -> Hz with optional triangular dither (reference convert.py:52-57),
  * NaN-aware mean/median smoothing filters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.conv import Conv2d, Dense

CENTS_PER_BIN = 20.0
PITCH_BINS = 360
SAMPLE_RATE = 16000
WINDOW_SIZE = 1024
CENTS_OFFSET = 1997.3794084376191
MAX_FMAX = 2006.0


class Crepe(nn.Module):
    """capacity 'full' or 'tiny' (crepe/model.py:20-28)."""

    capacity: str = "full"

    @nn.compact
    def __call__(self, frames: jax.Array) -> jax.Array:
        """[N, 1024] normalized windows -> [N, 360] sigmoid probabilities."""
        if self.capacity == "full":
            out_ch = [1024, 128, 128, 128, 256, 512]
            in_features = 2048
        elif self.capacity == "tiny":
            out_ch = [128, 16, 16, 16, 32, 64]
            in_features = 256
        else:
            raise ValueError(self.capacity)
        kernels = [(512, 1)] + 5 * [(64, 1)]
        strides = [(4, 1)] + 5 * [(1, 1)]
        pads = [(254, 0)] + 5 * [((31, 32), 0)]

        x = frames[:, :, None, None]  # NHWC: [N, 1024, 1, 1]
        for i in range(6):
            pad_h = pads[i][0]
            pad_h = (pad_h, pad_h) if isinstance(pad_h, int) else pad_h
            x = jnp.pad(x, ((0, 0), pad_h, (0, 0), (0, 0)))
            x = Conv2d(out_ch[i], kernels[i], stride=strides[i], name=f"conv{i + 1}")(x)
            x = jax.nn.relu(x)
            # BatchNorm folded to per-channel affine at conversion
            scale = self.param(f"bn{i + 1}_scale", nn.initializers.ones, (out_ch[i],))
            bias = self.param(f"bn{i + 1}_bias", nn.initializers.zeros, (out_ch[i],))
            x = x * scale + bias
            x = nn.max_pool(x, (2, 1), strides=(2, 1))
        x = x.reshape(x.shape[0], in_features)
        return jax.nn.sigmoid(Dense(PITCH_BINS, name="classifier")(x))


def convert_crepe(sd) -> dict:
    from . import convert as C

    p = {}
    for i in range(1, 7):
        w = C._np(sd[f"conv{i}.weight"])  # (O, I, Kh, Kw)
        p[f"conv{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": C._np(sd[f"conv{i}.bias"]),
        }
        bn_w = C._np(sd[f"conv{i}_BN.weight"])
        bn_b = C._np(sd[f"conv{i}_BN.bias"])
        mean = C._np(sd[f"conv{i}_BN.running_mean"])
        var = C._np(sd[f"conv{i}_BN.running_var"])
        eps = 0.0010000000474974513
        scale = bn_w / np.sqrt(var + eps)
        p[f"bn{i}_scale"] = scale
        p[f"bn{i}_bias"] = bn_b - mean * scale
    p["classifier"] = C.dense(sd, "classifier")
    return p


def load_crepe(ckpt_path: str, capacity: str = "full"):
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    return Crepe(capacity), convert_crepe(sd)


# ------------------------------------------------------------------ framing


def frame_audio(audio: np.ndarray, hop_length: int) -> np.ndarray:
    """Pad WINDOW/2 and frame (reference core.py:preprocess). [T] -> [N, 1024]."""
    total_frames = 1 + len(audio) // hop_length
    padded = np.pad(audio, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
    idx = np.arange(total_frames)[:, None] * hop_length + np.arange(WINDOW_SIZE)[None, :]
    return padded[idx].astype(np.float32)


def normalize_frames(frames: jax.Array) -> jax.Array:
    """Per-frame mean-center + std-scale (core.py:695-700)."""
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    # torch .std() is Bessel-corrected (ddof=1)
    std = jnp.maximum(jnp.std(frames, axis=1, keepdims=True, ddof=1), 1e-10)
    return frames / std


# ------------------------------------------------------------------ decoding


def bins_to_cents(bins, dither_rng: np.random.Generator | None = None):
    cents = CENTS_PER_BIN * np.asarray(bins, np.float64) + CENTS_OFFSET
    if dither_rng is not None:
        # triangular dither removes quantization error (convert.py:52-57)
        noise = dither_rng.triangular(-CENTS_PER_BIN, 0.0, CENTS_PER_BIN, cents.shape)
        cents = cents + noise
    return cents


def cents_to_frequency(cents):
    return 10.0 * 2.0 ** (np.asarray(cents) / 1200.0)


def frequency_to_bins(freq, quantize=np.floor):
    cents = 1200.0 * np.log2(np.asarray(freq, np.float64) / 10.0)
    return quantize((cents - CENTS_OFFSET) / CENTS_PER_BIN).astype(np.int64)


def _transition_matrix() -> np.ndarray:
    xx, yy = np.meshgrid(range(PITCH_BINS), range(PITCH_BINS))
    t = np.maximum(12 - abs(xx - yy), 0).astype(np.float64)
    return (t / t.sum(axis=1, keepdims=True)).astype(np.float32)


@jax.jit
def _viterbi_trellis(log_prob: jax.Array):
    """[T, S] log observation probs -> (per-step values [T-1, S],
    backpointers [T-1, S]).

    Emitting every step's value row (not just the final one) lets the host
    backtrace start from ANY step t — so the trellis length can be padded to
    a bucket (one compiled program per bucket instead of one per utterance
    length) and the padded steps simply ignored."""
    log_trans = jnp.log(jnp.asarray(_transition_matrix()) + 1e-30)  # [from, to]
    init = log_prob[0] + jnp.log(1.0 / PITCH_BINS)

    def step(value, obs):
        # value [S_from]; scores [from, to]
        scores = value[:, None] + log_trans
        ptr = jnp.argmax(scores, axis=0)
        new_value = jnp.max(scores, axis=0) + obs
        return new_value, (new_value, ptr)

    _, (values, ptrs) = jax.lax.scan(step, init, log_prob[1:])
    return init, values, ptrs


_VITERBI_BUCKET = 256


def viterbi_decode(probs: np.ndarray) -> np.ndarray:
    """[T, 360] probabilities (softmaxed logits) -> [T] bin path.

    Same HMM as librosa.sequence.viterbi with the reference's triangular
    transition matrix (decode.py:55-80). The device trellis runs at a
    bucketed static length (zero-padded observations are never read by the
    backtrace), the backtrace on host.
    """
    T = len(probs)
    log_prob = np.log(np.maximum(probs, 1e-30))
    t_pad = max(2, -(-T // _VITERBI_BUCKET) * _VITERBI_BUCKET)
    padded = np.zeros((t_pad, log_prob.shape[1]), log_prob.dtype)
    padded[:T] = log_prob
    init, values, ptrs = _viterbi_trellis(jnp.asarray(padded))
    values, ptrs = np.asarray(values), np.asarray(ptrs)
    path = np.empty(T, np.int64)
    if T == 1:
        path[0] = int(np.argmax(np.asarray(init)))
        return path
    path[-1] = int(np.argmax(values[T - 2]))
    for t in range(T - 2, -1, -1):
        path[t] = ptrs[t, path[t + 1]]
    return path


# ------------------------------------------------------------------ filters


def nan_mean_filter(x: np.ndarray, win_length: int = 9) -> np.ndarray:
    """NaN-aware moving average (reference filter.mean, filter.py:10-62)."""
    mask = ~np.isnan(x)
    vals = np.where(mask, x, 0.0)
    kernel = np.ones(win_length)
    pad = win_length // 2
    summed = np.convolve(np.pad(vals, (pad, pad)), kernel, "valid")
    count = np.convolve(np.pad(mask.astype(np.float64), (pad, pad)), kernel, "valid")
    out = summed / np.maximum(count, 1.0)
    out[out == 0] = np.nan
    return out[: len(x)]


def nan_median_filter(x: np.ndarray, win_length: int) -> np.ndarray:
    """NaN-aware moving median (reference filter.median, filter.py:65-134)."""
    pad = win_length // 2
    mask = ~np.isnan(x)
    vals = np.where(mask, x, 0.0)
    vp = np.pad(vals, (pad, pad), mode="reflect")
    mp = np.pad(mask.astype(np.float64), (pad, pad), mode="constant")
    idx = np.arange(len(x))[:, None] + np.arange(win_length)[None, :]
    win_v = vp[idx]
    win_m = mp[idx]
    win_v = np.where(win_m > 0, win_v, np.inf)
    win_sorted = np.sort(win_v, axis=1)
    count = win_m.sum(axis=1).astype(np.int64)
    med_idx = np.maximum((count - 1) // 2, 0)
    out = win_sorted[np.arange(len(x)), med_idx]
    out[np.isinf(out)] = np.nan
    return out


# ------------------------------------------------------------------ pipeline


@partial(jax.jit, static_argnums=0)
def _crepe_program(model: Crepe, params, batch):
    """Module-level jit (static model): one compiled [batch_size, 1024]
    program reused across every utterance — no per-call re-trace."""
    return model.apply({"params": params}, normalize_frames(batch))


def predict(
    model: Crepe,
    params,
    audio16k: np.ndarray,
    hop_length: int = 160,
    fmin: float = 50.0,
    fmax: float = 1000.0,
    batch_size: int = 512,
    dither_rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (pitch Hz [T], periodicity [T]) (reference crepe.predict, core.py:49)."""
    frames = frame_audio(audio16k, hop_length)
    n = len(frames)
    n_pad = (-n) % batch_size
    frames = np.pad(frames, ((0, n_pad), (0, 0)))

    probs = np.concatenate(
        [np.asarray(_crepe_program(model, params,
                                   jnp.asarray(frames[i : i + batch_size])))
         for i in range(0, len(frames), batch_size)]
    )[:n]

    # frequency-range mask (core.py:postprocess)
    minidx = frequency_to_bins(fmin)
    maxidx = frequency_to_bins(fmax, np.ceil)
    masked = probs.copy()
    masked[:, :minidx] = -np.inf
    masked[:, maxidx:] = -np.inf

    # viterbi over softmaxed logits (decode.py:64-67 applies softmax over bins)
    ex = np.exp(masked - masked.max(axis=1, keepdims=True))
    soft = ex / ex.sum(axis=1, keepdims=True)
    bins = viterbi_decode(soft)
    pitch = cents_to_frequency(bins_to_cents(bins, dither_rng)).astype(np.float32)
    periodicity = probs[np.arange(n), bins].astype(np.float32)
    return pitch, periodicity


def compute_f0(model, params, audio16k: np.ndarray,
               rng: np.random.Generator | None = None,
               batch_size: int = 512) -> np.ndarray:
    """Train-prep F0 at hop 160 (reference prepare/preprocess_crepe.py:11-44):
    +0.001 sigma audio noise, median-7 periodicity, mean-5 pitch smoothing,
    pitch[periodicity < 0.5] = 0.

    batch_size only groups frames per device call (frames are independent —
    values are identical at any batch size); the staged preprocessing driver
    passes a larger batch to cut per-call dispatch latency."""
    audio = audio16k.astype(np.float32)
    if rng is not None:
        audio = audio + rng.standard_normal(len(audio)).astype(np.float32) * 0.001
    pitch, peri = predict(model, params, audio, hop_length=160, dither_rng=rng,
                          batch_size=batch_size)
    peri = nan_median_filter(peri.astype(np.float64), 7)
    pitch = nan_mean_filter(pitch.astype(np.float64), 5)
    pitch = np.where(np.nan_to_num(peri) < 0.5, 0.0, np.nan_to_num(pitch))
    return pitch.astype(np.float32)


def compute_f0_sing(model, params, audio16k: np.ndarray,
                    rng: np.random.Generator | None = None) -> np.ndarray:
    """Inference-side F0 (reference pitch/inference.py:74-101): +0.001 sigma
    audio noise, hop 320, x2 repeat to the 160-hop rate, then mean-5 smoothing
    (no U/V gating — unvoiced handling is downstream)."""
    audio = audio16k.astype(np.float32)
    if rng is not None:
        audio = audio + rng.standard_normal(len(audio)).astype(np.float32) * 0.001
    pitch, _ = predict(model, params, audio, hop_length=320, dither_rng=rng)
    pitch = np.repeat(pitch, 2)
    pitch = nan_mean_filter(pitch.astype(np.float64), 5)
    return np.nan_to_num(pitch).astype(np.float32)
