"""Feature retrieval (RVC-style) — exact top-k on the MXU instead of faiss.

The reference builds per-speaker faiss IVF-Flat L2 indexes over all training
hubert (256-d) and whisper (1280-d) features, kmeans-compressed to <= 10k
vectors (feature_retrieval/index.py:147-154, transform.py:29-49,
svc_train_retrieval.py:69-73), and at inference blends each chunk's features
with the weighted top-k neighbors: out = (1-ratio)*x + ratio*sum(w_i * v_i),
w ~ (1/d^2)^2 normalized (index.py:65-94 — faiss METRIC_L2 scores are squared
distances).

At <= 10k centroids, exact k-NN is a single [T, N] distance matmul — faster on
TPU than an approximate IVF probe on CPU, and it removes the C++ dependency
(SURVEY.md §2.9). Indexes are .npz files of raw vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class IRetrieval:
    def retriv_whisper(self, vec: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def retriv_hubert(self, vec: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class DummyRetrieval(IRetrieval):
    def retriv_whisper(self, vec: np.ndarray) -> np.ndarray:
        return np.asarray(vec, np.float32)

    def retriv_hubert(self, vec: np.ndarray) -> np.ndarray:
        return np.asarray(vec, np.float32)


@partial(jax.jit, static_argnames=("k",))
def _retrieve_blend(query: jax.Array, bank: jax.Array, ratio: float, k: int):
    """query [T, D], bank [N, D] -> blended [T, D]."""
    q2 = jnp.sum(query * query, axis=1, keepdims=True)
    b2 = jnp.sum(bank * bank, axis=1)
    d2 = q2 + b2[None, :] - 2.0 * query @ bank.T  # squared L2, [T, N]
    neg_d2, idx = jax.lax.top_k(-d2, k)
    scores = jnp.maximum(-neg_d2, 1e-12)
    weight = jnp.square(1.0 / scores)
    weight = weight / jnp.sum(weight, axis=1, keepdims=True)
    nearest = bank[idx]  # [T, k, D]
    blended = jnp.sum(nearest * weight[..., None], axis=1)
    return (1.0 - ratio) * query + ratio * blended


class ArrayIndexRetrieval(IRetrieval):
    """retriv() semantics of FaissRVCRetrievableFeatureIndex (index.py:57-94)."""

    def __init__(self, whisper_bank: np.ndarray, hubert_bank: np.ndarray,
                 ratio: float, n_nearest: int):
        if n_nearest < 1:
            raise ValueError("n-retrieval-vectors must be gte 1")
        if not (0 <= ratio <= 1):
            raise ValueError(f"{ratio=} must be in range (0, 1)")
        self.whisper_bank = jnp.asarray(whisper_bank, jnp.float32)
        self.hubert_bank = jnp.asarray(hubert_bank, jnp.float32)
        self.ratio = ratio
        self.k = n_nearest

    def retriv_whisper(self, vec: np.ndarray) -> np.ndarray:
        return np.asarray(_retrieve_blend(
            jnp.asarray(vec, jnp.float32), self.whisper_bank, self.ratio, self.k
        ))

    def retriv_hubert(self, vec: np.ndarray) -> np.ndarray:
        return np.asarray(_retrieve_blend(
            jnp.asarray(vec, jnp.float32), self.hubert_bank, self.ratio, self.k
        ))


def compress_features(features: np.ndarray, threshold: int = 200_000,
                      n_clusters: int = 10_000, seed: int = 1234) -> np.ndarray:
    """kmeans compression of oversized feature banks (transform.py:29-49)."""
    if len(features) < threshold:
        return features.astype(np.float32)
    from scipy.cluster.vq import kmeans2

    centroids, _ = kmeans2(features.astype(np.float64), n_clusters,
                           minit="points", seed=seed)
    return centroids.astype(np.float32)


def build_index(feature_dir_files: list[str], out_path: str, **compress_kw):
    """Stack per-utterance feature npys -> compressed bank npz
    (svc_train_retrieval.py semantics, one index per speaker per feature)."""
    feats = np.concatenate([np.load(f) for f in feature_dir_files], axis=0)
    bank = compress_features(feats, **compress_kw)
    np.savez_compressed(out_path, bank=bank)
    return bank


def load_index(path: str) -> np.ndarray:
    return np.load(path)["bank"]


def create_retrieval(enable: bool, ratio: float, n_nearest: int,
                     whisper_index_path: str | None,
                     hubert_index_path: str | None) -> IRetrieval:
    """svc_inference.py:41-58 equivalent."""
    if not enable:
        return DummyRetrieval()
    return ArrayIndexRetrieval(
        load_index(whisper_index_path), load_index(hubert_index_path),
        ratio, n_nearest,
    )
