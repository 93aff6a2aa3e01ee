"""Decoder long-T anomaly diagnostic (VERDICT r4 next #2).

Round 4 recorded two anomalies in the 2520-frame shipped-geometry decoder:
(a) ~15% per-frame superlinearity vs the 1000-frame cost, and (b) Pallas
snake kernels that win 3-5x standalone at these shapes but measure neutral
in the full graph. This tool measures the decoder forward at both lengths
with the Pallas kernels on AND off, then prints per-op-class breakdowns of
the four traces so the extra milliseconds have names.

Usage: python tools/diag_decoder.py [--frames 1000 2520] [--top 25]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.trace_train import breakdown, load_trace  # noqa: E402


def build(hp, pallas):
    import jax

    from whisper_vits_svc_tpu.models.generator import Generator

    return Generator(
        upsample_input=hp.gen.upsample_input,
        upsample_rates=tuple(hp.gen.upsample_rates),
        upsample_kernel_sizes=tuple(hp.gen.upsample_kernel_sizes),
        upsample_initial_channel=hp.gen.upsample_initial_channel,
        resblock_kernel_sizes=tuple(hp.gen.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in hp.gen.resblock_dilation_sizes),
        spk_dim=hp.vits.spk_dim,
        pallas_snake=pallas and jax.default_backend() == "tpu",
    )


def measure(gen, t_frames, tag, top):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    hop = 320
    z = jnp.asarray(rng.standard_normal((1, t_frames, gen.upsample_input)),
                    jnp.float32) * 0.1
    spk = jnp.asarray(rng.standard_normal((1, gen.spk_dim)), jnp.float32) * 0.1
    src = jnp.asarray(rng.standard_normal((1, t_frames * hop, 1)),
                      jnp.float32) * 0.1
    gp = jax.jit(gen.init)(jax.random.PRNGKey(0), spk, z,
                           har_source=src)["params"]

    @jax.jit
    def dec(p, z, spk, src):
        return gen.apply({"params": p}, spk, z, har_source=src)

    jax.block_until_ready(dec(gp, z, spk, src))
    trace_dir = tempfile.mkdtemp(prefix=f"diag_dec_{tag}_")
    jax.profiler.start_trace(trace_dir)
    o = None
    for i in range(4):
        o = dec(gp, z + i * 1e-5, spk, src)
    jax.block_until_ready(o)
    jax.profiler.stop_trace()

    trace = load_trace(trace_dir)
    step_ms, n, ops = breakdown(trace, step_prefix="jit_dec")
    print(f"\n=== {tag}: t={t_frames} -> {step_ms:.2f} ms/call "
          f"({step_ms / t_frames * 1e3:.2f} us/frame, {n} calls)")
    total_us = sum(v for _, v in ops)
    for name, us in ops[:top]:
        print(f"  {name[:64]:64s} {us / 1e3 / max(n, 1):8.3f} ms "
              f"{100 * us / max(total_us, 1e-9):5.1f}%")

    # top INDIVIDUAL spans (fusion.N kept distinct) with their HLO scope,
    # so 'fusion' has names
    events = trace.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "CPU" not in str(e.get("args", {}).get("name", ""))
    }
    from collections import defaultdict

    per_span = defaultdict(lambda: [0.0, ""])
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        per_span[name][0] += e["dur"]
        tf_op = str(e.get("args", {}).get("tf_op", ""))[:90]
        if tf_op:
            per_span[name][1] = tf_op
    print("  -- top individual spans --")
    for name, (us, scope) in sorted(per_span.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {name[:40]:40s} {us / 1e3 / max(n, 1):8.3f} ms  {scope}")
    return step_ms, dict(ops), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[1000, 2520])
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    from whisper_vits_svc_tpu.utils.config import load_config

    enable_compile_cache()
    hp = load_config("configs/base.yaml")

    results = {}
    for pallas in (True, False):
        gen = build(hp, pallas)
        for t in args.frames:
            tag = f"{'pallas' if pallas else 'jnp'}_{t}"
            results[tag] = measure(gen, t, tag, args.top)

    print("\n=== summary (us/frame) ===")
    for tag, (ms, _, _) in results.items():
        t = int(tag.rsplit("_", 1)[1])
        print(f"  {tag:16s} {ms:8.2f} ms  {ms / t * 1e3:6.2f} us/frame")


if __name__ == "__main__":
    main()
