"""Serialized serving artifacts for the synthesis graph (jax.export).

The reference's deployment story is "load the .pth in this repo's python"
(svc_export.py -> svc_inference.py). For production serving we additionally
export the jitted chunk-synthesis function as a **StableHLO artifact**:
a single self-contained file (weights baked in as constants) that any
jax-capable host can deserialize and call — no model code, no flax, no
checkpoint conversion at serve time, and the graph is version-pinned
against framework drift.

    export_synthesis(params, hp, "svc_serving.bin", chunk_frames=2520)
    fn = load_synthesis("svc_serving.bin")
    wav = fn(ppg, vec, pit, spk, lengths, source, seed)   # jittable

The artifact is shape-specialized to one chunk geometry (static shapes are
the TPU contract; the chunked pipeline always pads to `out_chunk +
2*hop_frame` frames, infer/pipeline.py). Multi-platform lowering
(platforms=("tpu", "cpu")) makes one artifact servable on both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def build_synthesis_fn(params, hp, compute_dtype=None):
    """-> f(ppg, vec, pit, spk, lengths, source, seed) with weights captured.

    `seed` (int32 scalar) drives the prior-noise draw, so a server varies the
    noise per chunk exactly like the CLI path's per-chunk rngs — same seed ->
    reproducible output (ADVICE r3: a baked fixed key repeated the identical
    noise tensor across every chunk of an utterance). Pallas kernels are left
    off: a pallas_call inside the serialized module would pin it to one TPU
    generation."""
    from .pipeline import build_infer_model

    model = build_infer_model(hp, pallas_snake=False)
    if compute_dtype is not None:
        params = jax.tree.map(lambda x: jnp.asarray(x, compute_dtype), params)

    def fn(ppg, vec, pit, spk, lengths, source, seed):
        cast = (lambda x: x.astype(compute_dtype)) if compute_dtype else (lambda x: x)
        out = model.apply(
            {"params": params},
            cast(ppg), cast(vec), pit, cast(spk), lengths, cast(source),
            rngs={"noise": jax.random.PRNGKey(seed)},
        )
        return out.astype(jnp.float32)

    return fn


def export_synthesis(
    params,
    hp,
    path: str,
    chunk_frames: int = 2520,
    batch: int = 1,
    platforms: tuple[str, ...] | None = None,
    compute_dtype=None,
) -> int:
    """Serialize the synthesis graph to `path`; returns the artifact size.

    chunk_frames=2520 is the pipeline's static chunk (25 s + 2x100 ms
    overlap at 100 fps, reference svc_inference.py:96-98)."""
    hop = hp.data.hop_length
    fn = build_synthesis_fn(params, hp, compute_dtype=compute_dtype)
    b, t = batch, chunk_frames
    args = (
        jax.ShapeDtypeStruct((b, t, hp.vits.ppg_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, t, hp.vits.vec_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, t), jnp.float32),
        jax.ShapeDtypeStruct((b, hp.vits.spk_dim), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b, t * hop, 1), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),  # per-chunk noise seed
    )
    return export_jitted(fn, args, path, platforms)


def load_synthesis(path: str):
    """Deserialize a serving artifact -> jittable callable."""
    return load_exported(path)


def export_jitted(fn, args_spec: tuple, path: str,
                  platforms: tuple[str, ...] | None = None) -> int:
    """Serialize any jittable fn at the given ShapeDtypeStruct signature."""
    if platforms is None:
        platforms = (jax.default_backend(),)
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(*args_spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Deserialize any serving artifact -> callable (jittable)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return lambda *args: exported.call(*args)


def export_extractor(kind: str, params, path: str, *,
                     batch: int = 1, model=None,
                     platforms: tuple[str, ...] | None = None) -> int:
    """Serving artifacts for the feature extractors (weights baked in).

    kind='whisper': [B, 240000] 16 kHz wav (one 15 s window = WINDOW_SAMPLES,
        whisper/inference.py:37) -> log-mel -> PPG [B, 750, 1280].
    kind='hubert': [B, 320000] 16 kHz wav (20 s chunk,
        hubert/inference.py:30) -> soft units [B, T//320, 256].
    kind='crepe': [N, 1024] raw windows -> normalize -> [N, 360] bin
        probabilities (batch = N, reference batch 512).

    `model` overrides the default-dims module (e.g. reduced test configs)."""
    if kind == "whisper":
        from ..models.whisper import WINDOW_SAMPLES, WhisperEncoder, log_mel_spectrogram

        model = model or WhisperEncoder()

        def fn(wav):
            return model.apply({"params": params}, log_mel_spectrogram(wav))

        spec = (jax.ShapeDtypeStruct((batch, WINDOW_SAMPLES), jnp.float32),)
    elif kind == "hubert":
        from ..models.hubert import HubertSoft

        model = model or HubertSoft()

        def fn(wav):
            return model.apply({"params": params}, wav)

        spec = (jax.ShapeDtypeStruct((batch, 20 * 16000), jnp.float32),)
    elif kind == "crepe":
        from ..models.crepe import Crepe, normalize_frames

        model = model or Crepe(capacity="full")

        def fn(frames):
            return model.apply({"params": params}, normalize_frames(frames))

        spec = (jax.ShapeDtypeStruct((batch, 1024), jnp.float32),)
    else:
        raise ValueError(f"unknown extractor kind {kind!r}")
    return export_jitted(fn, spec, path, platforms)
