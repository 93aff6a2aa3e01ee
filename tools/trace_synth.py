"""Device-trace per-op breakdown of chunked synthesis (bench.py's workload).

Usage: python tools/trace_synth.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.trace_train import breakdown, load_trace  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.models.synthesizer import SynthesizerInfer
    from whisper_vits_svc_tpu.nn.nsf import source_hn_nsf

    sr, hop, chunk_frames = 32000, 320, 1000
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
        ppg, vec, pit, spk, lengths, jnp.zeros((b, chunk_frames * hop, 1)),
    )["params"]

    @jax.jit
    def synth(params, ppg, vec, pit, spk, lengths):
        source = source_hn_nsf(pit, hop, sr, rng=None)
        return model.apply(
            {"params": params}, ppg, vec, pit, spk, lengths, source,
            rngs={"noise": jax.random.PRNGKey(2)},
        )

    out = synth(params, ppg, vec, pit, spk, lengths)
    out.block_until_ready()
    print("compiled; tracing...", flush=True)

    trace_dir = tempfile.mkdtemp(prefix="synth_trace_")
    jax.profiler.start_trace(trace_dir)
    for i in range(4):
        out = synth(params, ppg, vec, pit + i * 1e-4, spk, lengths)
    out.block_until_ready()
    jax.profiler.stop_trace()

    step_ms, n, ops = breakdown(load_trace(trace_dir), step_prefix="jit_synth")
    total_op_ms = sum(v for _, v in ops) / 1e3
    rtf = (b * chunk_frames * hop / sr) / (step_ms / 1e3)
    print(f"\ndevice ms per 10s chunk: {step_ms:.2f} over {n} calls -> {rtf:.0f}x RT")
    print(f"sum of op spans: {total_op_ms / max(n, 1):.2f} ms/call\n")
    print(f"{'op':60s} {'ms/call':>9s} {'%':>6s}")
    for name, us in ops[:30]:
        ms = us / 1e3 / max(n, 1)
        print(f"{name[:60]:60s} {ms:9.3f} {100 * us / 1e3 / max(total_op_ms, 1e-9):6.1f}")


if __name__ == "__main__":
    main()
