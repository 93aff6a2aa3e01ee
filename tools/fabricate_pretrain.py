"""Fabricate random-weight extractor checkpoints in the REFERENCE formats.

The pretrained blobs (whisper_pretrain/large-v2.pt, hubert-soft,
crepe full.pth, speaker best_model.pth.tar) are not in this image
(.MISSING_LARGE_BLOBS). This tool writes random-weight checkpoints with the
exact tensor names/shapes the reference ships — so `svc_preprocessing` (and
the converters in models/convert.py) exercise their REAL loading paths end to
end (docs/E2E_RUN_r04.md). Weights are random: features are meaningless but
every shape, key and code path is the production one.

Usage: python tools/fabricate_pretrain.py --out-dir <dir> [--whisper-layers 32]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _t(rng, *shape, scale=0.02):
    import torch

    return torch.from_numpy(
        (rng.standard_normal(shape) * scale).astype(np.float32))


def fabricate_whisper(path: str, rng, n_layer: int = 32):
    """OpenAI large-v2 checkpoint format: {dims, model_state_dict} —
    the loader deletes the decoder and the last 1/4 of encoder blocks
    (whisper/inference.py:11-29), so only the kept 3/4 need tensors."""
    import torch

    d = 1280
    dims = {
        "n_mels": 80, "n_vocab": 51865, "n_audio_ctx": 1500,
        "n_audio_state": d, "n_audio_head": 20, "n_audio_layer": n_layer,
        "n_text_ctx": 448, "n_text_state": d, "n_text_head": 20,
        "n_text_layer": 32,
    }
    keep = n_layer - n_layer // 4
    sd = {
        "encoder.conv1.weight": _t(rng, d, 80, 3),
        "encoder.conv1.bias": _t(rng, d),
        "encoder.conv2.weight": _t(rng, d, d, 3, scale=0.005),
        "encoder.conv2.bias": _t(rng, d),
        "encoder.ln_post.weight": _t(rng, d, scale=0.0) + 1.0,
        "encoder.ln_post.bias": _t(rng, d, scale=0.0),
    }
    for i in range(keep):
        b = f"encoder.blocks.{i}"
        sd[f"{b}.attn.query.weight"] = _t(rng, d, d, scale=0.005)
        sd[f"{b}.attn.query.bias"] = _t(rng, d)
        sd[f"{b}.attn.key.weight"] = _t(rng, d, d, scale=0.005)
        sd[f"{b}.attn.value.weight"] = _t(rng, d, d, scale=0.005)
        sd[f"{b}.attn.value.bias"] = _t(rng, d)
        sd[f"{b}.attn.out.weight"] = _t(rng, d, d, scale=0.005)
        sd[f"{b}.attn.out.bias"] = _t(rng, d)
        sd[f"{b}.attn_ln.weight"] = _t(rng, d, scale=0.0) + 1.0
        sd[f"{b}.attn_ln.bias"] = _t(rng, d, scale=0.0)
        sd[f"{b}.mlp.0.weight"] = _t(rng, 4 * d, d, scale=0.005)
        sd[f"{b}.mlp.0.bias"] = _t(rng, 4 * d)
        sd[f"{b}.mlp.2.weight"] = _t(rng, d, 4 * d, scale=0.005)
        sd[f"{b}.mlp.2.bias"] = _t(rng, d)
        sd[f"{b}.mlp_ln.weight"] = _t(rng, d, scale=0.0) + 1.0
        sd[f"{b}.mlp_ln.bias"] = _t(rng, d, scale=0.0)
    torch.save({"dims": dims, "model_state_dict": sd}, path)


def fabricate_hubert(path: str, rng):
    """bshall hubert-soft checkpoint (hubert/hubert_model.py keys)."""
    import torch

    sd = {}
    specs = [(512, 1, 10), (512, 512, 3), (512, 512, 3), (512, 512, 3),
             (512, 512, 3), (512, 512, 2), (512, 512, 2)]
    for i, (o, c, k) in enumerate(specs):
        sd[f"feature_extractor.conv{i}.weight"] = _t(rng, o, c, k)
    sd["feature_extractor.norm0.weight"] = _t(rng, 512, scale=0.0) + 1.0
    sd["feature_extractor.norm0.bias"] = _t(rng, 512, scale=0.0)
    sd["feature_projection.norm.weight"] = _t(rng, 512, scale=0.0) + 1.0
    sd["feature_projection.norm.bias"] = _t(rng, 512, scale=0.0)
    sd["feature_projection.projection.weight"] = _t(rng, 768, 512)
    sd["feature_projection.projection.bias"] = _t(rng, 768)
    sd["positional_embedding.conv.weight_v"] = _t(rng, 768, 48, 128)
    sd["positional_embedding.conv.weight_g"] = _t(rng, 1, 1, 128, scale=0.0) + 1.0
    sd["positional_embedding.conv.bias"] = _t(rng, 768)
    sd["norm.weight"] = _t(rng, 768, scale=0.0) + 1.0
    sd["norm.bias"] = _t(rng, 768, scale=0.0)
    for i in range(12):
        b = f"encoder.layers.{i}"
        sd[f"{b}.self_attn.in_proj_weight"] = _t(rng, 3 * 768, 768, scale=0.01)
        sd[f"{b}.self_attn.in_proj_bias"] = _t(rng, 3 * 768)
        sd[f"{b}.self_attn.out_proj.weight"] = _t(rng, 768, 768, scale=0.01)
        sd[f"{b}.self_attn.out_proj.bias"] = _t(rng, 768)
        sd[f"{b}.linear1.weight"] = _t(rng, 3072, 768, scale=0.01)
        sd[f"{b}.linear1.bias"] = _t(rng, 3072)
        sd[f"{b}.linear2.weight"] = _t(rng, 768, 3072, scale=0.01)
        sd[f"{b}.linear2.bias"] = _t(rng, 768)
        sd[f"{b}.norm1.weight"] = _t(rng, 768, scale=0.0) + 1.0
        sd[f"{b}.norm1.bias"] = _t(rng, 768, scale=0.0)
        sd[f"{b}.norm2.weight"] = _t(rng, 768, scale=0.0) + 1.0
        sd[f"{b}.norm2.bias"] = _t(rng, 768, scale=0.0)
    sd["proj.weight"] = _t(rng, 256, 768)
    sd["proj.bias"] = _t(rng, 256)
    import torch

    torch.save(sd, path)


def fabricate_crepe(path: str, rng, capacity: str = "full"):
    """torchcrepe assets/{full,tiny}.pth format (crepe/model.py keys)."""
    import torch

    if capacity == "full":
        out_ch = [1024, 128, 128, 128, 256, 512]
    else:
        out_ch = [128, 16, 16, 16, 32, 64]
    in_ch = [1] + out_ch[:-1]
    kh = [512] + [64] * 5
    sd = {}
    for i in range(1, 7):
        o, c = out_ch[i - 1], in_ch[i - 1]
        sd[f"conv{i}.weight"] = _t(rng, o, c, kh[i - 1], 1)
        sd[f"conv{i}.bias"] = _t(rng, o)
        sd[f"conv{i}_BN.weight"] = _t(rng, o, scale=0.0) + 1.0
        sd[f"conv{i}_BN.bias"] = _t(rng, o, scale=0.0)
        sd[f"conv{i}_BN.running_mean"] = _t(rng, o, scale=0.0)
        sd[f"conv{i}_BN.running_var"] = _t(rng, o, scale=0.0) + 1.0
    feat = 2048 if capacity == "full" else 256
    sd["classifier.weight"] = _t(rng, 360, feat)
    sd["classifier.bias"] = _t(rng, 360)
    torch.save(sd, path)


def fabricate_speaker(path: str, rng):
    """mozilla-TTS LSTM d-vector best_model.pth.tar ({"model": sd})."""
    import torch

    sd = {}
    in_dims = [80, 256, 256]
    for i in range(3):
        b = f"layers.{i}"
        sd[f"{b}.lstm.weight_ih_l0"] = _t(rng, 4 * 768, in_dims[i], scale=0.01)
        sd[f"{b}.lstm.weight_hh_l0"] = _t(rng, 4 * 768, 768, scale=0.01)
        sd[f"{b}.lstm.bias_ih_l0"] = _t(rng, 4 * 768)
        sd[f"{b}.lstm.bias_hh_l0"] = _t(rng, 4 * 768)
        sd[f"{b}.linear.weight"] = _t(rng, 256, 768, scale=0.01)
    torch.save({"model": sd}, path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--whisper-layers", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    rng = np.random.default_rng(args.seed)
    os.makedirs(os.path.join(args.out_dir, "whisper_pretrain"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "hubert_pretrain"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "crepe_pretrain"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "speaker_pretrain"), exist_ok=True)
    w = os.path.join(args.out_dir, "whisper_pretrain", "large-v2.pt")
    fabricate_whisper(w, rng, args.whisper_layers)
    print(f"wrote {w} ({os.path.getsize(w) / 1e9:.2f} GB)")
    h = os.path.join(args.out_dir, "hubert_pretrain", "hubert-soft-0d54a1f4.pt")
    fabricate_hubert(h, rng)
    print(f"wrote {h}")
    c = os.path.join(args.out_dir, "crepe_pretrain", "full.pth")
    fabricate_crepe(c, rng)
    print(f"wrote {c}")
    s = os.path.join(args.out_dir, "speaker_pretrain", "best_model.pth.tar")
    fabricate_speaker(s, rng)
    print(f"wrote {s}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
