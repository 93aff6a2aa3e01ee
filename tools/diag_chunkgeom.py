"""Chunk-geometry sweep through the SHIPPED svc_infer path (VERDICT r4 #2).

The 2520-frame chunk runs at 42.6 us/frame while the 1000-frame graph runs
at 37.1 — the per-op traces show the gap living in XLA's conv fusions
(superlinear in T), not the snake kernels (linear). Since chunks are
independent given the shared whole-utterance excitation, the same 25 s of
audio can run as a BATCH of smaller sub-chunks: this sweep measures real
svc_infer RTF across (out_chunk, chunk_batch) at fixed total audio.

Usage: python tools/diag_chunkgeom.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.infer import pipeline
    from whisper_vits_svc_tpu.infer.retrieval import DummyRetrieval
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    from whisper_vits_svc_tpu.utils.config import load_config
    from whisper_vits_svc_tpu.utils.device_trace import measure_device_total_ms

    enable_compile_cache()
    hp = load_config("configs/base.yaml")
    model = pipeline.build_infer_model(hp)
    rng = np.random.default_rng(1)
    t = 5000  # 50 s of features = 2 reference chunks
    ppg = (rng.standard_normal((t, 1280)) * 0.1).astype(np.float32)
    vec = (rng.standard_normal((t, 256)) * 0.1).astype(np.float32)
    pit = rng.uniform(100, 400, t).astype(np.float32)
    spk = (rng.standard_normal(256) * 0.1).astype(np.float32)

    t0 = 8
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t0, 1280)), jnp.zeros((1, t0, 256)),
        jnp.full((1, t0), 200.0), jnp.zeros((1, 256)),
        jnp.full((1,), t0, jnp.int32), jnp.zeros((1, t0 * 320, 1)),
    )["params"]

    audio_seconds = 2 * t * 320 / 32000.0  # 2 calls below

    for out_chunk, cb in [(2500, 1), (1250, 2), (1000, 1), (834, 3),
                          (1250, 1)]:
        kw = dict(noise_scale=1.0, out_chunk=out_chunk, hop_frame=10,
                  chunk_batch=cb)
        pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg,
                           vec, hp, **kw)

        def run():
            for i in range(2):
                pipeline.svc_infer(model, params, DummyRetrieval(), spk,
                                   pit + (i + 1) * 1e-4, ppg, vec, hp, **kw)

        ms = measure_device_total_ms(
            run, ("jit__chunk_program", "jit__source_program"))
        if ms is None:
            print(f"out_chunk={out_chunk} cb={cb}: no trace")
            continue
        rtf = audio_seconds / (ms / 1e3)
        print(f"out_chunk={out_chunk} cb={cb}: total {ms:7.2f} ms "
              f"-> {rtf:6.1f}x RT ({ms / (2 * t) * 1e3:5.2f} us/frame)",
              flush=True)


if __name__ == "__main__":
    main()
