"""Training-step throughput benchmark (full base config, synthetic batch).

Not the driver's headline bench (that's bench.py); records utterances/s and
audio-seconds/s for one chip into stdout for BASELINE.md bookkeeping.
"""

import json
import time

import numpy as np


def main():
    import jax

    from whisper_vits_svc_tpu.train.step import init_train_states, make_train_step
    from whisper_vits_svc_tpu.utils.config import load_config

    hp = load_config("configs/base.yaml")
    hp["data"]["training_files"] = "unused"
    batch = 8
    t_frames = 300  # 3 s utterances (bucket midpoint)
    hop = hp.data.hop_length

    rng = np.random.default_rng(0)
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

    g_state, d_state, m = step(g_state, d_state, make_batch(0), jax.random.PRNGKey(0))
    jax.block_until_ready(m["loss_g"])

    iters = 10
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            g_state, d_state, m = step(
                g_state, d_state, make_batch(r * iters + i + 1),
                jax.random.PRNGKey(i),
            )
        jax.block_until_ready(m["loss_g"])
        best = min(best, time.perf_counter() - t0)

    utt_s = iters * batch / best
    audio_s = utt_s * t_frames * hop / hp.data.sampling_rate
    print(json.dumps({
        "metric": "train_utterances_per_second",
        "value": round(utt_s, 2),
        "unit": "utt/s/chip (batch 8, 3s utts)",
        "audio_seconds_per_second": round(audio_s, 2),
        "loss_g": float(m["loss_g"]),
    }))


if __name__ == "__main__":
    main()
