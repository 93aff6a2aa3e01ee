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

__all__ = ["device_ms_per_call", "device_total_ms", "measure_device_ms",
           "measure_device_total_ms"]


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


def device_total_ms(trace_dir: str,
                    name_prefixes: tuple[str, ...]) -> float | None:
    """TOTAL device-side duration (ms) across jit-program spans matching any
    of `name_prefixes` — for composite walks (e.g. the svc_infer chunk loop:
    chunk program + bucketed source program) where per-call means are not
    the quantity of interest."""
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
        and any(e.get("name", "").startswith(p) for p in name_prefixes)
    ]
    if not spans:
        return None
    return sum(e["dur"] for e in spans) / 1e3


def measure_device_total_ms(run_calls: Callable[[], None],
                            name_prefixes: tuple[str, ...]) -> float | None:
    """Trace ``run_calls()`` and return TOTAL device ms across matching
    spans (see device_total_ms)."""
    import jax

    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        jax.profiler.start_trace(trace_dir)
        try:
            run_calls()
        finally:
            jax.profiler.stop_trace()
        return device_total_ms(trace_dir, tuple(name_prefixes))
    except Exception:
        return None


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
