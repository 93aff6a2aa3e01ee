"""Host input-pipeline throughput: batches/s from a data_svc workspace.

Measures the serial batch-producer rate (SvcDataset.get through the native
C++ loader + BucketBatcher collate) that feeds the async device step — the
number to compare against the chip's consumption rate (15.6 batches/s at
the 64 ms/step train time, docs/PERFORMANCE.md). Reports the steady-state
rate (second repetition; the first pays one-time page faults).

Usage: python tools/bench_input.py --config <yaml> [--epochs 12]
(run from a workspace containing data_svc/ + files/train.txt)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--epochs", type=int, default=12)
    args = ap.parse_args()

    from whisper_vits_svc_tpu.data import native_loader as nl
    from whisper_vits_svc_tpu.data.dataset import (
        BucketBatcher, SvcDataset, boundaries_for,
    )
    from whisper_vits_svc_tpu.utils.config import load_config

    hp = load_config(args.config)
    ds = SvcDataset(hp.data.training_files, hp.data)
    batcher = BucketBatcher(ds, hp.train.batch_size,
                            boundaries=boundaries_for(hp.data))

    rates = []
    for rep in range(2):
        n = 0
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            for _ in batcher.epoch_batches(epoch):
                n += 1
        rates.append(n / (time.perf_counter() - t0))
    print(json.dumps({
        "metric": "input_pipeline_batches_per_second",
        "value": round(rates[-1], 2),
        "first_pass": round(rates[0], 2),
        "items": len(ds),
        "batch_size": hp.train.batch_size,
        "native_loader": nl.available(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }))


if __name__ == "__main__":
    main()
