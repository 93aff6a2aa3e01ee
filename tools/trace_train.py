"""Device-trace breakdown of the GAN train step on the real chip.

Captures an xprof trace of a few train steps and prints:
  - mean device ms per step (the jit_train_step span)
  - top-20 device ops by total time, grouped by fused-op name prefix

Usage: python tools/trace_train.py [--bf16]
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_trace(trace_dir):
    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(paths[-1]) as f:
        return json.load(f)


def breakdown(trace, step_prefix="jit_train_step"):
    events = trace.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "CPU" not in str(e.get("args", {}).get("name", ""))
    }
    # thread-name metadata: XLA Op lanes vs step lanes
    spans = [e for e in events if e.get("ph") == "X" and e.get("pid") in device_pids]
    steps = [e for e in spans if e.get("name", "").startswith(step_prefix)]
    step_ms = sum(e["dur"] for e in steps) / max(len(steps), 1) / 1e3

    # per-op: spans that are NOT the top-level program and NOT steady-state markers
    ops = defaultdict(float)
    for e in spans:
        n = e.get("name", "")
        if n.startswith(step_prefix) or n.startswith("jit_"):
            continue
        # strip trailing .N / digits to group fusion instances
        key = re.sub(r"[.\d]+$", "", n)
        ops[key] += e["dur"]
    return step_ms, len(steps), sorted(ops.items(), key=lambda kv: -kv[1])


_MODULES = ["mrd_0", "mrd_1", "mrd_2", "mrd_3", "mpd_", "msd", "dec/",
            "enc_q", "enc_p", "flow/", "speaker_classifier"]


def module_breakdown(trace, n_steps):
    """(module, fwd/bwd) ms/step attribution from the XLA-op lane's tf_op
    paths (the jit scope path JAX attaches to each HLO); ops whose tf_op is
    lost in backward rewrites land in 'other/bwd'."""
    events = trace.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    mods = defaultdict(float)
    cats = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        a = e.get("args", {})
        t = a.get("tf_op")
        if t is None:
            continue  # not an XLA-op lane event
        cats[a.get("hlo_category", "?")] += e["dur"]
        side = "bwd" if "transpose(jvp" in t else "fwd+bwd"
        name = next((m for m in _MODULES if m in t), "other")
        mods[f"{name:20s} {side}"] += e["dur"]
    n = max(n_steps, 1)
    # per-span detail of the data-formatting class (copies/transposes):
    # which module scope they sit in and the HLO shape, so layout work is
    # attributable to a specific boundary (VERDICT r3 #4)
    fmt = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        a = e.get("args", {})
        t = a.get("tf_op")
        if t is None or a.get("hlo_category") not in (
                "data formatting", "copy", "pad"):
            continue
        mod = "/".join(p for p in t.split("/") if not p.startswith("jit"))
        fmt[f"{e.get('name', '?'):34s} {a.get('shape', ''):24s} {mod[-60:]}"] += e["dur"]
    return (
        sorted(((k, v / 1e3 / n) for k, v in mods.items()), key=lambda kv: -kv[1]),
        sorted(((k, v / 1e3 / n) for k, v in cats.items()), key=lambda kv: -kv[1]),
        sorted(((k, v / 1e3 / n) for k, v in fmt.items()), key=lambda kv: -kv[1]),
    )


def main():
    import argparse

    import jax

    from whisper_vits_svc_tpu.train.step import init_train_states, make_train_step
    from whisper_vits_svc_tpu.utils.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bf16-discriminator", action="store_true")
    args, _ = ap.parse_known_args()

    hp = load_config("configs/base.yaml")
    if args.bf16_discriminator:
        hp["train"]["bf16_discriminator"] = True
    batch, t_frames = args.batch, 300
    hop = hp.data.hop_length

    g_state, d_state, g_model, d_model = init_train_states(hp, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(hp, g_model, d_model))  # program: jit_train_step

    def make_batch(i):
        r = np.random.default_rng(i)
        return dict(
            ppg=r.standard_normal((batch, t_frames, hp.vits.ppg_dim)).astype(np.float32) * 0.1,
            vec=r.standard_normal((batch, t_frames, hp.vits.vec_dim)).astype(np.float32) * 0.1,
            pit=r.uniform(100, 400, (batch, t_frames)).astype(np.float32),
            spk=r.standard_normal((batch, hp.vits.spk_dim)).astype(np.float32),
            spec=np.abs(r.standard_normal(
                (batch, t_frames, hp.data.filter_length // 2 + 1))).astype(np.float32),
            audio=(r.standard_normal((batch, t_frames * hop, 1)) * 0.2).astype(np.float32),
            ppg_l=np.full((batch,), t_frames, np.int32),
            spec_l=np.full((batch,), t_frames, np.int32),
        )

    g_state, d_state, m = step(g_state, d_state, make_batch(0), jax.random.PRNGKey(0))
    jax.block_until_ready(m["loss_g"])
    print("compiled; tracing...", flush=True)

    trace_dir = tempfile.mkdtemp(prefix="train_trace_")
    jax.profiler.start_trace(trace_dir)
    for i in range(8):
        g_state, d_state, m = step(g_state, d_state, make_batch(i + 1),
                                   jax.random.PRNGKey(i))
    jax.block_until_ready(m["loss_g"])
    jax.profiler.stop_trace()

    trace = load_trace(trace_dir)
    step_ms, n, ops = breakdown(trace)
    total_op_ms = sum(v for _, v in ops) / 1e3
    if n == 0:
        n, step_ms = 8, total_op_ms / 8  # fall back to summed op spans
    print(f"\ndevice step time: {step_ms:.2f} ms over {n} steps "
          f"(utt/s = {batch / (step_ms / 1e3):.1f}, "
          f"audio-s/s = {batch * t_frames * hop / hp.data.sampling_rate / (step_ms / 1e3):.1f})")
    print(f"sum of op spans: {total_op_ms / max(n,1):.2f} ms/step\n")
    print(f"{'op':60s} {'ms/step':>9s} {'%':>6s}")
    for name, us in ops[:25]:
        ms = us / 1e3 / max(n, 1)
        print(f"{name[:60]:60s} {ms:9.3f} {100 * us / 1e3 / max(total_op_ms, 1e-9):6.1f}")

    mods, cats, fmt = module_breakdown(trace, n)
    print(f"\n{'module (tf_op path)':30s} {'ms/step':>9s}")
    for name, ms in mods:
        print(f"{name:30s} {ms:9.2f}")
    print(f"\n{'hlo category':30s} {'ms/step':>9s}")
    for name, ms in cats[:12]:
        print(f"{name:30s} {ms:9.2f}")
    print(f"\n{'data-formatting span (op / shape / module scope)':90s} {'ms/step':>9s}")
    for name, ms in fmt[:20]:
        print(f"{name[:118]:118s} {ms:9.3f}")


if __name__ == "__main__":
    main()
