"""LSTM d-vector speaker encoder + its mozilla-TTS audio frontend.

Reference speaker/models/lstm.py:8-101 and speaker/utils/audio.py (config
speaker_pretrain/config.json): 3x (LSTM-768 -> Linear-256 no-bias) stack,
L2-normalized last frame; `compute_embedding` averages 10 sliding 250-frame
windows. The LSTM recurrence is a lax.scan with torch gate order (i, f, g, o).

Frontend: 16 kHz, preemphasis 0.98, STFT (1024/256/1024, center reflect),
slaney mel 80 (fmin 0, fmax 8000), 20*log10 dB, symmetric [-4, 4] norm, and
a -60 dB silence trim (audio.py:561-714).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from scipy.signal import lfilter

from ..ops.mel import mel_filterbank


class LSTMCellScan(nn.Module):
    """Single-layer LSTM with torch parameterization, scanned over time."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, D] -> [B, T, hidden]."""
        d = x.shape[-1]
        h = self.hidden_size
        w_ih = self.param("w_ih", nn.initializers.xavier_normal(), (d, 4 * h))
        w_hh = self.param("w_hh", nn.initializers.xavier_normal(), (h, 4 * h))
        b_ih = self.param("b_ih", nn.initializers.zeros, (4 * h,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (4 * h,))

        xw = jnp.einsum("btd,dk->btk", x, w_ih, preferred_element_type=jnp.float32) + b_ih

        def step(carry, xt):
            h_prev, c_prev = carry
            gates = xt + h_prev @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h_new, c), h_new

        b = x.shape[0]
        init = (jnp.zeros((b, h)), jnp.zeros((b, h)))
        _, hs = jax.lax.scan(step, init, xw.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)


class LSTMSpeakerEncoder(nn.Module):
    input_dim: int = 80
    proj_dim: int = 256
    lstm_dim: int = 768
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array,
                 lengths: jax.Array | None = None) -> jax.Array:
        """[B, T, 80] mel -> [B, 256] L2-normalized d-vector (last frame).

        lengths [B] selects the last REAL frame per row for right-zero-padded
        batches: the LSTM is causal, so the state at frame lengths[i]-1 is
        bit-identical to a natural-length run — padding rows to a shape
        bucket is exact (the preprocessing driver's one-program-per-bucket
        surface, ADVICE r4 #2)."""
        for i in range(self.num_layers):
            x = LSTMCellScan(self.lstm_dim, name=f"lstm_{i}")(x)
            w = self.param(f"proj_{i}", nn.initializers.xavier_normal(),
                           (self.lstm_dim, self.proj_dim))
            x = x @ w
        if lengths is None:
            d = x[:, -1]
        else:
            d = x[jnp.arange(x.shape[0]), lengths - 1]
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-12)


def convert_speaker_encoder(sd) -> dict:
    from . import convert as C

    p = {}
    for i in range(3):
        b = f"layers.{i}"
        p[f"lstm_{i}"] = {
            "w_ih": C._np(sd[f"{b}.lstm.weight_ih_l0"]).T,
            "w_hh": C._np(sd[f"{b}.lstm.weight_hh_l0"]).T,
            "b_ih": C._np(sd[f"{b}.lstm.bias_ih_l0"]),
            "b_hh": C._np(sd[f"{b}.lstm.bias_hh_l0"]),
        }
        p[f"proj_{i}"] = C._np(sd[f"{b}.linear.weight"]).T
    return p


def load_speaker_encoder(ckpt_path: str):
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return LSTMSpeakerEncoder(), convert_speaker_encoder(sd)


# ------------------------------------------------------- ResNet alternative


class _BN(nn.Module):
    """Inference-mode BatchNorm as folded per-channel affine."""

    channels: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return x * scale + bias


class SEBasicBlock(nn.Module):
    """Squeeze-excite ResNet block (reference speaker/models/resnet.py:26-56)."""

    planes: int
    stride: tuple[int, int] = (1, 1)
    downsample: bool = False
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        from ..nn.conv import Conv2d, Dense

        residual = x
        out = Conv2d(self.planes, (3, 3), stride=self.stride, padding=(1, 1),
                     use_bias=False, name="conv1")(x)
        out = jax.nn.relu(out)
        out = _BN(self.planes, name="bn1")(out)
        out = Conv2d(self.planes, (3, 3), padding=(1, 1), use_bias=False,
                     name="conv2")(out)
        out = _BN(self.planes, name="bn2")(out)
        # squeeze-excite
        y = jnp.mean(out, axis=(1, 2))
        y = jax.nn.relu(Dense(self.planes // self.reduction, name="se_fc1")(y))
        y = jax.nn.sigmoid(Dense(self.planes, name="se_fc2")(y))
        out = out * y[:, None, None, :]
        if self.downsample:
            residual = Conv2d(self.planes, (1, 1), stride=self.stride,
                              use_bias=False, name="ds_conv")(x)
            residual = _BN(self.planes, name="ds_bn")(residual)
        return jax.nn.relu(out + residual)


class ResNetSpeakerEncoder(nn.Module):
    """H/ASP SE-ResNet d-vector (alternative encoder, reference resnet.py:59-180;
    unused by the default pipeline there — kept for capability parity).
    Input [B, T, input_dim] mel; output [B, proj_dim]."""

    input_dim: int = 64
    proj_dim: int = 512
    layers: tuple[int, ...] = (3, 4, 6, 3)
    num_filters: tuple[int, ...] = (32, 64, 128, 256)
    encoder_type: str = "ASP"
    log_input: bool = False

    @nn.compact
    def __call__(self, x, l2_norm: bool = False):
        from ..nn.conv import Conv1d as _C1, Conv2d, Dense

        if self.log_input:
            x = jnp.log(x + 1e-6)
        # instance norm over time per mel bin (torch InstanceNorm1d on [B, D, T])
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        # torch NCHW [B, 1, D, T] -> NHWC [B, D, T, 1]
        h = x.transpose(0, 2, 1)[..., None]

        h = Conv2d(self.num_filters[0], (3, 3), padding=(1, 1), name="conv1")(h)
        h = jax.nn.relu(h)
        h = _BN(self.num_filters[0], name="bn1")(h)

        inplanes = self.num_filters[0]
        for li, (blocks, planes) in enumerate(zip(self.layers, self.num_filters)):
            stride = (1, 1) if li == 0 else (2, 2)
            for bi in range(blocks):
                down = bi == 0 and (stride != (1, 1) or inplanes != planes)
                h = SEBasicBlock(
                    planes, stride if bi == 0 else (1, 1), downsample=down,
                    name=f"layer{li + 1}_{bi}",
                )(h)
            inplanes = planes

        # [B, D/8, T', C] -> [B, C*(D/8), T'] (torch reshape semantics)
        b = h.shape[0]
        h = h.transpose(0, 3, 1, 2).reshape(b, -1, h.shape[2])  # [B, C*D/8, T']
        feat = h.transpose(0, 2, 1)  # [B, T', F]
        w = _C1(128, 1, name="att_conv1")(feat)
        w = jax.nn.relu(w)
        w = _BN(128, name="att_bn")(w)
        w = _C1(feat.shape[-1], 1, name="att_conv2")(w)
        w = jax.nn.softmax(w, axis=1)  # softmax over time (torch dim=2)

        if self.encoder_type == "SAP":
            pooled = jnp.sum(feat * w, axis=1)
        else:  # ASP
            mu = jnp.sum(feat * w, axis=1)
            sg = jnp.sqrt(
                jnp.clip(jnp.sum(jnp.square(feat) * w, axis=1) - jnp.square(mu), 1e-5)
            )
            pooled = jnp.concatenate([mu, sg], axis=1)
        out = Dense(self.proj_dim, name="fc")(pooled)
        if l2_norm:
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)
        return out


# ---------------------------------------------------------------- frontend

SR = 16000
N_FFT = 1024
HOP = 256
WIN = 1024
N_MELS = 80
PREEMPHASIS = 0.98
REF_DB = 20.0
MIN_DB = -100.0
MAX_NORM = 4.0
TRIM_DB = 60.0


def trim_silence(audio: np.ndarray, top_db: float = TRIM_DB,
                 frame_length: int = WIN, hop_length: int = HOP) -> np.ndarray:
    """librosa.effects.trim equivalent (audio.py:714)."""
    n = 1 + max(len(audio) - frame_length, 0) // hop_length
    if n == 0:
        return audio
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    rms = np.sqrt(np.mean(np.square(audio[idx]), axis=1))
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(rms.max(), 1e-10))
    keep = np.flatnonzero(db > -top_db)
    if len(keep) == 0:
        return audio[:0]
    start = int(keep[0] * hop_length)
    end = min(len(audio), int((keep[-1] + 1) * hop_length + frame_length))
    return audio[start:end]


def speaker_melspectrogram(audio: np.ndarray) -> np.ndarray:
    """[T] 16 kHz float audio -> [frames, 80] normalized mel (audio.py:561-570).

    Pure numpy (same windowed-DFT basis as ops/stft.py): this is host-side
    DSP — the round-3 eager-jnp version cost ~8 device dispatches per
    utterance, which through a high-latency TPU tunnel dominated the whole
    speaker stage (tools/bench_prep.py)."""
    from ..ops.stft import _windowed_dft

    emph = lfilter([1.0, -PREEMPHASIS], [1.0], audio).astype(np.float32)
    pad = N_FFT // 2
    y = np.pad(emph, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - N_FFT) // HOP
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    basis = _windowed_dft(N_FFT, WIN, "hann")
    spec = y[idx] @ basis
    n_bins = N_FFT // 2 + 1
    mag = np.sqrt(spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2)
    mel_w = mel_filterbank(SR, N_FFT, N_MELS, 0.0, 8000.0)
    mel = mag @ mel_w.T
    db = REF_DB * np.log10(np.maximum(1e-5, mel))
    db = db - REF_DB
    norm = (db - MIN_DB) / (-MIN_DB) * 2.0 * MAX_NORM - MAX_NORM
    return np.clip(norm, -MAX_NORM, MAX_NORM).astype(np.float32)


@partial(jax.jit, static_argnums=0)
def _embed_program(model: LSTMSpeakerEncoder, params, batch):
    """Module-level jit (static model): the [10, 250, 80] window batch is one
    compiled program reused across every utterance (>=4 s of trimmed audio
    always hits the same shape)."""
    return jnp.mean(model.apply({"params": params}, batch), axis=0)


@partial(jax.jit, static_argnums=(0, 3))
def _spk_batch_program(model: LSTMSpeakerEncoder, params, batch, n_utts,
                       lengths=None):
    """[n_utts*10, nf, 80] windows from MANY utterances -> [n_utts, 256]
    (per-utterance mean of its 10 window embeddings) — the preprocessing
    driver's cross-utterance batching surface. lengths [n_utts*10] marks the
    real frame count of right-zero-padded rows (exact — causal LSTM, see
    LSTMSpeakerEncoder.__call__), so windows of different nf share one
    compiled program per shape bucket instead of one per distinct nf."""
    emb = model.apply({"params": params}, batch, lengths)
    return jnp.mean(emb.reshape(n_utts, 10, emb.shape[-1]), axis=1)


def compute_embedding(model: LSTMSpeakerEncoder, params, audio16k: np.ndarray,
                      num_frames: int = 250, num_eval: int = 10,
                      trim: bool = True) -> np.ndarray:
    """Utterance -> 256-d d-vector, mean of 10 sliding windows (lstm.py:76-101)."""
    if trim:
        audio16k = trim_silence(audio16k)
    mel = speaker_melspectrogram(audio16k)
    max_len = mel.shape[0]
    nf = min(num_frames, max_len)
    offsets = np.linspace(0, max_len - nf, num=num_eval).astype(int)
    batch = np.stack([mel[o : o + nf] for o in offsets])
    return np.asarray(_embed_program(model, params, jnp.asarray(batch)))
