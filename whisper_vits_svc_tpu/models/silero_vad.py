"""Silero VAD (v3 "VADr_v3_medium_conc") reimplemented in JAX.

The reference post-filter loads the TorchScript binary `vad/assets/
silero_vad.jit` (vad/utils.py:146) and scores 512-sample windows of the 16 kHz
input (vad/utils.py:263-268). The network inside that blob is:

    STFT(n_fft 256, hop 64, reflect pad 96)            -> magnitude [129, F]
    AdaptiveAudioNormalization: log1p(mag * 2^20) minus the time-mean of a
        7-tap-smoothed channel-mean                    -> [129, F]
    concat(mag, norm)                                  -> [258, F]
    ConvBlock(258->16)                                 (dw k5 p2 + pw 1x1 + residual proj)
    3x [1x1 stride-2 conv + BN + ReLU + ConvBlock]     (16->32->32->64; F/8)
    1x1 conv + BN + ReLU                               -> [64, F/16ish]
    2-layer LSTM(64) carried ACROSS windows            -> ReLU -> 1x1 -> sigmoid
    mean over frames                                   -> one prob per window

This module converts those weights (host-side, torch.jit.load once) into a
numpy pytree and runs the whole chunk sequence on-device: the conv stack is
batched over all windows at once (every conv is a matmul at these shapes) and
the LSTM is a single `lax.scan` over windows. BatchNorms are folded at load.

A 512-sample window yields 8 STFT frames -> 4 -> 2 -> 1 after the three
stride-2 stages, so the LSTM advances exactly one step per window, matching
the reference's stateful chunk loop.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------

def _fold_bn(bn) -> tuple[np.ndarray, np.ndarray]:
    import torch  # local: conversion is host-side and torch-optional at runtime

    with torch.no_grad():
        scale = (bn.weight / torch.sqrt(bn.running_var + bn.eps)).numpy()
        bias = (bn.bias - bn.running_mean * torch.from_numpy(scale)).numpy()
    return scale.astype(np.float32), bias.astype(np.float32)


def _conv_block(blk) -> dict:
    dw = list(blk.dw_conv.children())[0]
    pw = list(blk.pw_conv.children())[0]
    out = {
        "dw_w": dw.weight.detach().numpy()[:, 0, :],  # [C, 5] depthwise
        "dw_b": dw.bias.detach().numpy(),
        "pw_w": pw.weight.detach().numpy()[:, :, 0],  # [Cout, Cin]
        "pw_b": pw.bias.detach().numpy(),
    }
    if getattr(blk, "proj", None) is not None:
        out["proj_w"] = blk.proj.weight.detach().numpy()[:, :, 0]
        out["proj_b"] = blk.proj.bias.detach().numpy()
    return out


def load_silero_vad(path: str = "vad/assets/silero_vad.jit") -> dict:
    """torch.jit blob -> numpy pytree (16 kHz branch `_model`)."""
    import torch

    m = torch.jit.load(path, map_location="cpu")
    net = m._model
    enc = list(net.encoder.children())
    params = {
        "stft_basis": net.feature_extractor.forward_basis_buffer.detach()
        .numpy()[:, 0, :],  # [258, 256]
        "an_filter": net.adaptive_normalization.filter_.detach().numpy()[0, 0],  # [7]
        "first": _conv_block(list(net.first_layer.children())[0]),
        "enc": [],
        "dec_w": list(net.decoder.decoder.children())[1]
        .weight.detach().numpy()[:, :, 0],  # [1, 64]
        "dec_b": list(net.decoder.decoder.children())[1].bias.detach().numpy(),
        "lstm": [],
    }
    for conv_i, bn_i, blk_i in [(0, 1, 3), (4, 5, 7), (8, 9, 11)]:
        scale, bias = _fold_bn(enc[bn_i])
        params["enc"].append({
            "w": enc[conv_i].weight.detach().numpy()[:, :, 0],
            "b": enc[conv_i].bias.detach().numpy(),
            "bn_scale": scale,
            "bn_bias": bias,
            "block": _conv_block(list(enc[blk_i].children())[0]),
        })
    scale, bias = _fold_bn(enc[13])
    params["enc_post"] = {
        "w": enc[12].weight.detach().numpy()[:, :, 0],
        "b": enc[12].bias.detach().numpy(),
        "bn_scale": scale,
        "bn_bias": bias,
    }
    rnn = net.decoder.rnn
    for layer in (0, 1):
        params["lstm"].append({
            "w_ih": getattr(rnn, f"weight_ih_l{layer}").detach().numpy(),  # [4H, in]
            "w_hh": getattr(rnn, f"weight_hh_l{layer}").detach().numpy(),
            "b": (getattr(rnn, f"bias_ih_l{layer}")
                  + getattr(rnn, f"bias_hh_l{layer}")).detach().numpy(),
        })
    return jax.tree.map(lambda a: np.asarray(a, np.float32), params)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _depthwise5(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, C, F] depthwise k=5 pad=2 as 5 shifted adds (F is tiny: <= 8)."""
    xp = jnp.pad(x, [(0, 0), (0, 0), (2, 2)])
    F = x.shape[-1]
    out = sum(w[None, :, k, None] * jax.lax.dynamic_slice_in_dim(xp, k, F, axis=2)
              for k in range(5))
    return out + b[None, :, None]


def _pw(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("oc,ncf->nof", w, x) + b[None, :, None]


def _conv_block_fwd(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = _pw(jax.nn.relu(_depthwise5(x, p["dw_w"], p["dw_b"])), p["pw_w"], p["pw_b"])
    res = _pw(x, p["proj_w"], p["proj_b"]) if "proj_w" in p else x
    return jax.nn.relu(h + res)


@partial(jax.jit, static_argnames=("window",))
def _probs_jit(params: dict, chunks: jnp.ndarray, window: int) -> jnp.ndarray:
    """chunks [N, window] -> speech prob per chunk [N] (LSTM state across N)."""
    n_fft, hop, pad = 256, 64, (256 - 64) // 2
    x = jnp.pad(chunks, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = (x.shape[1] - n_fft) // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]  # [N, F, 256]
    spec = jnp.einsum("nfk,ck->ncf", frames, jnp.asarray(params["stft_basis"]))
    re, im = spec[:, :129], spec[:, 129:]
    mag = jnp.sqrt(re * re + im * im)

    # adaptive normalization (stt_model_blocks.AdaptiveAudioNormalizationNew)
    spect = jnp.log1p(mag * 1048576.0)
    mean = jnp.mean(spect, axis=1)  # [N, F]
    mean = jnp.concatenate(
        [mean[:, 1:4][:, ::-1], mean, mean[:, -4:-1][:, ::-1]], axis=1)  # simple_pad 3
    k = jnp.asarray(params["an_filter"])
    sm = sum(k[j] * mean[:, j : j + n_frames] for j in range(7))
    norm = spect - jnp.mean(sm, axis=-1)[:, None, None]

    h = _conv_block_fwd(params["first"], jnp.concatenate([mag, norm], axis=1))
    for st in params["enc"]:
        # the three encoder stages are 1x1 stride-2 convs in the blob
        h = _pw(h[:, :, ::2], st["w"], st["b"])
        h = jax.nn.relu(h * st["bn_scale"][None, :, None] + st["bn_bias"][None, :, None])
        h = _conv_block_fwd(st["block"], h)
    ep = params["enc_post"]
    h = _pw(h, ep["w"], ep["b"])
    h = jax.nn.relu(h * ep["bn_scale"][None, :, None] + ep["bn_bias"][None, :, None])
    # [N, 64, T'] with T' == 1 for the trained window sizes; keep general by
    # scanning over (chunk, frame) pairs so LSTM state still flows across chunks.
    feats = h.transpose(0, 2, 1).reshape(-1, h.shape[1])  # [N*T', 64]

    H = params["lstm"][0]["w_hh"].shape[1]

    def cell(p, carry, x_t):
        hs, cs = carry
        gates = x_t @ p["w_ih"].T + hs @ p["w_hh"].T + p["b"]
        i, f, g, o = jnp.split(gates, 4)
        cs = jax.nn.sigmoid(f) * cs + jax.nn.sigmoid(i) * jnp.tanh(g)
        hs = jax.nn.sigmoid(o) * jnp.tanh(cs)
        return (hs, cs), hs

    def step(carry, x_t):
        (h0, c0), (h1, c1) = carry
        (h0, c0), y = cell(params["lstm"][0], (h0, c0), x_t)
        (h1, c1), y = cell(params["lstm"][1], (h1, c1), y)
        return ((h0, c0), (h1, c1)), y

    zeros = (jnp.zeros(H), jnp.zeros(H))
    _, ys = jax.lax.scan(step, (zeros, zeros), feats)  # [N*T', 64]
    logits = jax.nn.relu(ys) @ jnp.asarray(params["dec_w"]).T + params["dec_b"]
    probs = jax.nn.sigmoid(logits).reshape(chunks.shape[0], -1)
    return jnp.mean(probs, axis=1)


def silero_speech_probs(
    params: dict, audio: np.ndarray, window_size_samples: int = 512
) -> np.ndarray:
    """Per-window speech probabilities for 16 kHz audio (vad/utils.py:263-268:
    zero-pad the trailing partial window, fresh LSTM state per utterance)."""
    audio = np.asarray(audio, np.float32)
    n_win = -(-len(audio) // window_size_samples)
    padded = np.zeros(n_win * window_size_samples, np.float32)
    padded[: len(audio)] = audio
    chunks = padded.reshape(n_win, window_size_samples)
    return np.asarray(_probs_jit(params, jnp.asarray(chunks), window_size_samples))
