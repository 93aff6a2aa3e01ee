"""whisper_vits_svc_tpu — a TPU-native singing-voice-conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PlayVoice/whisper-vits-svc (so-vits-svc 5.0): three-stage SVC pipeline
(feature extraction -> VITS core -> NSF-BigVGAN decoder), GAN training,
chunked streaming inference, and multi-chip scaling via jax.sharding.

Layout:
    ops/       pure-JAX / Pallas audio-math kernels (STFT, mel, resample, ...)
    nn/        flax modules (WN, rel-pos attention, snake, NSF source, flows)
    models/    model assemblies (synthesizer, discriminators, extractors)
    parallel/  mesh + sharding rules, multi-host init
    data/      dataset/bucketing/collate with static shapes
    train/     GAN training loop, losses, checkpointing
    infer/     chunked synthesis, retrieval, export/merge tools
    utils/     config tree, audio I/O, pitch utils
    cli/       command-line entry points mirroring the reference surface
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS env var even when a site hook has already
# pinned jax.config.jax_platforms (e.g. a TPU-tunnel sitecustomize setting
# "axon,cpu", which outranks the env var): `JAX_PLATFORMS=cpu python
# svc_trainer.py ...` must really run on CPU. Safe as long as no backend has
# been initialized yet, which holds when this package is imported first.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _want = _os.environ["JAX_PLATFORMS"]
    _have = _jax.config.jax_platforms or ""
    # Only intervene when the configured list doesn't already lead with the
    # requested platform (e.g. env "axon" vs config "axon,cpu" is satisfied —
    # rewriting would drop the cpu fallback).
    if _have.split(",")[0] != _want.split(",")[0]:
        try:
            _jax.config.update("jax_platforms", _want)
        except RuntimeError:
            pass  # backend already initialized; leave the active platform be
del _os
