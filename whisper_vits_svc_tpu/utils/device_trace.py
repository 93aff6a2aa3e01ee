"""Device-trace benchmarking: per-call DEVICE durations from an xprof trace.

Wall-clock through a shared TPU tunnel is unreliable in both directions
(async completion that block_until_ready does not fully await, plus pool
contention — see docs/PERFORMANCE.md). The trustworthy clock is the device
trace: the duration of the jitted program's span on the TPU lane of the
chrome trace that jax.profiler emits.

Used by bench.py / bench_train.py; the reference has no profiling at all
(SURVEY.md §5.1).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from typing import Callable

__all__ = ["device_ms_per_call", "measure_device_ms"]


def device_ms_per_call(trace_dir: str, name_prefix: str) -> float | None:
    """Mean device-side duration (ms) of jit-program spans in an xprof trace.

    Spans are matched by ``name_prefix`` (jit programs show up as
    ``jit_<fn_name>``) on non-CPU trace lanes. Returns None if the trace is
    missing or contains no matching device spans (e.g. CPU-only run).
    """
    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    device_pids = {
        e["pid"] for e in trace.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "CPU" not in str(e.get("args", {}).get("name", ""))
    }
    spans = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("pid") in device_pids
        and e.get("name", "").startswith(name_prefix)
    ]
    if not spans:
        return None
    return sum(e["dur"] for e in spans) / len(spans) / 1e3


def measure_device_ms(run_calls: Callable[[], None], name_prefix: str) -> float | None:
    """Trace ``run_calls()`` (which should issue >=2 perturbed jit calls and
    block on the last result) and return mean device ms per matching span."""
    import jax

    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        jax.profiler.start_trace(trace_dir)
        try:
            run_calls()
        finally:
            jax.profiler.stop_trace()
        return device_ms_per_call(trace_dir, name_prefix)
    except Exception:
        return None
