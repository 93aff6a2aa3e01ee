"""Training-step throughput benchmark (full base config, synthetic batch).

`measure_train()` is also imported by bench.py so the driver-captured BENCH
JSON carries a `train` block every round (VERDICT r4 #8) — ms/step, utt/s and
a small batch sweep with run_id provenance; standalone runs keep printing the
one-line JSON for BASELINE.md bookkeeping.

Methodology matches bench.py: the primary number is the per-step DEVICE
duration of the jitted train-step program parsed from an xprof trace
(wall-clock through the shared tunnel is unreliable in both directions —
docs/PERFORMANCE.md). Inputs are perturbed every call. Falls back to
per-call-blocked wall clock if trace capture fails.
"""

import json
import time

import numpy as np


def measure_train(batch: int = 8, bf16_discriminator: bool = False,
                  pallas_snake: bool = False, t_frames: int = 300,
                  n_calls: int = 4) -> dict:
    """One measured point: -> {utt_s, audio_seconds_per_second,
    device_ms_per_step, method, ...}. t_frames=300 is 3 s utterances (the
    bucket midpoint)."""
    import jax

    from whisper_vits_svc_tpu.train.step import init_train_states, make_train_step
    from whisper_vits_svc_tpu.utils.config import load_config
    from whisper_vits_svc_tpu.utils.device_trace import measure_device_ms

    hp = load_config("configs/base.yaml")
    hp["data"]["training_files"] = "unused"
    if bf16_discriminator:
        hp["train"]["bf16_discriminator"] = True
    if pallas_snake:
        hp["train"]["pallas_snake"] = True
    hop = hp.data.hop_length

    g_state, d_state, g_model, d_model = init_train_states(hp, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(hp, g_model, d_model))

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

    # warmup/compile
    g_state, d_state, m = step(g_state, d_state, make_batch(0), jax.random.PRNGKey(0))
    jax.block_until_ready(m["loss_g"])

    method = "device_trace"

    def run_calls():
        nonlocal g_state, d_state, m
        for i in range(n_calls):
            g_state, d_state, m = step(
                g_state, d_state, make_batch(i + 1), jax.random.PRNGKey(i)
            )
        jax.block_until_ready(m["loss_g"])

    ms_per_step = measure_device_ms(run_calls, name_prefix="jit_train_step")
    if ms_per_step is None:
        method = "wall_clock_blocked"
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            for i in range(5):
                g_state, d_state, m = step(
                    g_state, d_state, make_batch(100 + r * 5 + i),
                    jax.random.PRNGKey(i),
                )
                jax.block_until_ready(m["loss_g"])
            best = min(best, (time.perf_counter() - t0) / 5)
        ms_per_step = best * 1e3

    utt_s = batch / (ms_per_step / 1e3)
    audio_s = utt_s * t_frames * hop / hp.data.sampling_rate
    return {
        "batch": batch,
        "utt_s": round(utt_s, 2),
        "audio_seconds_per_second": round(audio_s, 2),
        "device_ms_per_step": round(ms_per_step, 2),
        "method": method,
        "bf16_discriminator": bool(bf16_discriminator),
        "pallas_snake": bool(pallas_snake),
        "loss_g": float(m["loss_g"]),
    }


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    # batch 16 = recommended config default since round 5 (configs/base.yaml
    # comment; measured per-chip sweet spot 144.2 utt/s vs 125.1 at batch 8 —
    # the reference's batch-8 default was a 6 GB GPU VRAM constraint,
    # reference README.md:233). --batch 8 keeps the reference-default point.
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bf16-discriminator", action="store_true",
                    help="measure with the bf16 MRD/MPD/MSD conv stacks")
    ap.add_argument("--pallas-snake", action="store_true",
                    help="Pallas SnakeAlias kernels (fwd+bwd) in the decoder")
    args, _ = ap.parse_known_args()

    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # repeat runs skip the ~10 min tunnel compile
    r = measure_train(batch=args.batch,
                      bf16_discriminator=args.bf16_discriminator,
                      pallas_snake=args.pallas_snake)
    print(json.dumps({
        "metric": "train_utterances_per_second",
        "value": r["utt_s"],
        "unit": f"utt/s/chip (batch {args.batch}, 3s utts)",
        **{k: v for k, v in r.items() if k not in ("batch", "utt_s")},
        # provenance (same rationale as bench.py)
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "run_id": f"{time.time_ns():x}",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
