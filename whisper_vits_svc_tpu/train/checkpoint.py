"""Checkpoint save/restore/export.

Same lifecycle as the reference (vits_extend/train.py:113-133, :265-309;
svc_export.py:48-57): full trainer checkpoints {model_g, model_d, optim_g,
optim_d, step, epoch, hp_raw}, key-tolerant warm start, mtime-based GC, and
inference-only export ({model_g} with enc_q stripped). Serialized as flax
msgpack of numpy pytrees — portable, no torch dependency.

`load_torch_pretrain` additionally accepts the reference's .pth checkpoints,
routed through models/convert.py.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, g_state, d_state, step: int, epoch: int, hp_raw: str = ""):
    payload = {
        "model_g": _to_numpy(g_state.params),
        "model_d": _to_numpy(d_state.params),
        "optim_g": serialization.to_state_dict(_to_numpy(g_state.opt_state)),
        "optim_d": serialization.to_state_dict(_to_numpy(d_state.opt_state)),
        "step": step,
        "epoch": epoch,
        "hp_raw": hp_raw,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def merge_tolerant(init_tree, saved_tree, path=""):
    """Key-by-key restore keeping init values for missing keys
    (reference load_model, vits_extend/train.py:43-59)."""
    if not isinstance(init_tree, dict):
        if saved_tree is None:
            return init_tree
        return np.asarray(saved_tree)
    out = {}
    for k, v in init_tree.items():
        if isinstance(saved_tree, dict) and k in saved_tree:
            out[k] = merge_tolerant(v, saved_tree[k], f"{path}/{k}")
        else:
            print(f"{path}/{k} is not in the checkpoint")
            out[k] = v
    return out


def restore_states(g_state, d_state, payload: dict):
    g_state = g_state.replace(
        params=merge_tolerant(_to_numpy(g_state.params), payload["model_g"]),
        opt_state=serialization.from_state_dict(g_state.opt_state, payload["optim_g"])
        if payload.get("optim_g") is not None else g_state.opt_state,
    )
    d_state = d_state.replace(
        params=merge_tolerant(_to_numpy(d_state.params), payload["model_d"]),
        opt_state=serialization.from_state_dict(d_state.opt_state, payload["optim_d"])
        if payload.get("optim_d") is not None else d_state.opt_state,
    )
    return g_state, d_state, int(payload.get("step", 0)), int(payload.get("epoch", 1))


def warm_start(g_state, d_state, payload: dict):
    """Model weights only, optimizers untouched (train.py:113-118)."""
    g_state = g_state.replace(
        params=merge_tolerant(_to_numpy(g_state.params), payload["model_g"])
    )
    if "model_d" in payload and payload["model_d"]:
        d_state = d_state.replace(
            params=merge_tolerant(_to_numpy(d_state.params), payload["model_d"])
        )
    return g_state, d_state


def export_inference(path: str, g_params):
    """Strip to {model_g} for SynthesizerInfer (svc_export.py:48-57).

    enc_q and speaker_classifier are dropped by construction: the infer graph
    simply has no such keys, and restore is key-tolerant.
    """
    keep = {k: v for k, v in _to_numpy(g_params).items()
            if k not in ("enc_q", "speaker_classifier", "emb_g")}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize({"model_g": keep}))


def load_torch_pretrain(path: str) -> dict:
    """Reference .pth -> our payload dict (models/convert.py mappings)."""
    import torch

    from ..models import convert

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd_g = ckpt.get("model_g", ckpt)
    payload = {"model_g": convert.synthesizer_trn(sd_g), "optim_g": None,
               "optim_d": None, "step": int(ckpt.get("step", 0)),
               "epoch": int(ckpt.get("epoch", 1)), "hp_raw": ""}
    if "model_d" in ckpt:
        payload["model_d"] = convert.discriminator(ckpt["model_d"])
    else:
        payload["model_d"] = {}
    return payload


def latest_checkpoint(pth_dir: str, name: str) -> str | None:
    """Newest `{name}_NNNN.ckpt` by mtime, or None (the auto-resume anchor
    for the train loop's NaN guard)."""
    if not os.path.isdir(pth_dir):
        return None
    pat = re.compile(rf"{re.escape(name)}_\d+\.ckpt$")
    files = [os.path.join(pth_dir, f) for f in os.listdir(pth_dir) if pat.match(f)]
    if not files:
        return None
    return max(files, key=os.path.getmtime)


def clean_checkpoints(pth_dir: str, name: str, keep: int):
    """mtime-ordered GC, 0 = keep all (reference train.py:280-309)."""
    if keep <= 0 or not os.path.isdir(pth_dir):
        return
    pat = re.compile(rf"{re.escape(name)}_\d+\.ckpt$")
    files = [os.path.join(pth_dir, f) for f in os.listdir(pth_dir) if pat.match(f)]
    files.sort(key=os.path.getmtime)
    for f in files[:-keep]:
        os.remove(f)
        print(f"Free up space by deleting ckpt {f}")
