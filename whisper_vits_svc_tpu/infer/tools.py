"""Model merge / average and speaker mixing tools.

svc_merge.py:18-58 (per-key lerp / N-way average of generator checkpoints) and
svc_eva.py:6-20 (weighted sum of singer embeddings -> new voice), operating on
our msgpack checkpoints' model_g pytrees.
"""

from __future__ import annotations

import numpy as np

from ..train import checkpoint as ckpt


def _tree_lerp(a, b, ratio: float):
    if isinstance(a, dict):
        return {k: _tree_lerp(a[k], b[k], ratio) for k in a}
    return np.asarray(a) * ratio + np.asarray(b) * (1.0 - ratio)


def _tree_mean(trees):
    if isinstance(trees[0], dict):
        return {k: _tree_mean([t[k] for t in trees]) for k in trees[0]}
    return np.mean([np.asarray(t) for t in trees], axis=0)


def merge_model(path_a: str, path_b: str, out_path: str, ratio: float = 0.5):
    """model_out = a * ratio + b * (1 - ratio) (svc_merge.py:33-39)."""
    from flax import serialization

    a = ckpt.load(path_a)["model_g"]
    b = ckpt.load(path_b)["model_g"]
    merged = _tree_lerp(a, b, ratio)
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize({"model_g": merged}))
    return merged


def average_model(paths: list[str], out_path: str):
    """N-way average (svc_merge.py:18-31)."""
    from flax import serialization

    trees = [ckpt.load(p)["model_g"] for p in paths]
    avg = _tree_mean(trees)
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize({"model_g": avg}))
    return avg


def mix_speakers(spk_paths: list[str], weights: list[float],
                 out_path: str | None = None) -> np.ndarray:
    """eva.spk = sum(w_i * spk_i) (svc_eva.py:6-20)."""
    assert len(spk_paths) == len(weights)
    mixed = sum(w * np.load(p) for p, w in zip(spk_paths, weights))
    mixed = np.asarray(mixed, np.float32)
    if out_path:
        np.save(out_path, mixed, allow_pickle=False)
    return mixed
