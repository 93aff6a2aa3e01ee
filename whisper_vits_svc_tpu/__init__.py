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
