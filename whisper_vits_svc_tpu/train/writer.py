"""Training observability: TensorBoard scalars/audio + JSONL metrics.

Same TensorBoard surface as the reference MyWriter (vits_extend/writer.py:12-35)
plus the throughput counters BASELINE.md tracks (steps/s, audio-seconds/s).
Falls back to JSONL-only when tensorboard is unavailable.
"""

from __future__ import annotations

import json
import os
import time


class TrainWriter:
    def __init__(self, log_dir: str, sample_rate: int = 32000):
        os.makedirs(log_dir, exist_ok=True)
        self.sample_rate = sample_rate
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            self.tb = None

    def log_training(self, metrics: dict, step: int):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            v = float(v)
            rec[k] = v
            if self.tb is not None:
                self.tb.add_scalar(f"train/{k}", v, step)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()

    def log_validation(self, mel_loss: float, step: int):
        if self.tb is not None:
            self.tb.add_scalar("validation/mel_loss", float(mel_loss), step)
        self.jsonl.write(
            json.dumps({"step": step, "validation_mel_loss": float(mel_loss)}) + "\n"
        )
        self.jsonl.flush()

    def log_audio(self, tag: str, audio, step: int):
        if self.tb is not None:
            self.tb.add_audio(tag, audio.reshape(1, -1), step, self.sample_rate)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
