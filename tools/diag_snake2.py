"""Isolate the in-graph Pallas snake overhead (VERDICT r4 next #2).

diag_decoder shows each snake custom-call costing ~1.3 ms inside the 2520
decoder while diag_snake measures 0.75/0.59 ms standalone at the same
shapes — a ~0.6 ms per-call in-graph premium, roughly shape-independent.
Candidate mechanisms: per-instruction kernel binary reload when calls are
interleaved with other ops (amortized in the standalone back-to-back loop),
layout copies accounted inside the span, or pipelining effects.

Microbenches (all [1, 10, 806400] f32):
  A. 6 calls of the SAME snake instance back-to-back in one jit
  B. 6 DISTINCT snake instances (different alpha/beta consts) back-to-back
  C. snake interleaved with a k=3 conv, 6 rounds
  D. snake interleaved with a cheap elementwise fusion, 6 rounds

Usage: python tools/diag_snake2.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.trace_train import breakdown, load_trace  # noqa: E402


def run_case(name, fn, x):
    import jax

    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(x))
    trace_dir = tempfile.mkdtemp(prefix=f"snake2_{name}_")
    jax.profiler.start_trace(trace_dir)
    o = None
    for i in range(3):
        o = jfn(x + i * 1e-5)
    jax.block_until_ready(o)
    jax.profiler.stop_trace()
    step_ms, n, ops = breakdown(load_trace(trace_dir), step_prefix="jit_")
    # per-op table
    print(f"\n== {name}: {step_ms:.2f} ms/call ({n} calls)")
    for op, us in ops[:6]:
        print(f"   {op[:50]:50s} {us / 1e3 / max(n, 1):8.3f} ms")


def main():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    c, t = 10, 806400
    x = jnp.asarray(rng.standard_normal((1, c, t)), jnp.float32) * 0.1
    al = jnp.zeros((c,))
    be = jnp.zeros((c,))
    kern = jnp.asarray(rng.standard_normal((3, c, c)), jnp.float32) * 0.1

    def case_a(x):
        y = x
        for _ in range(6):
            y = snake_alias_cm_pallas(y * 0.999, al, be)
        return y

    def case_b(x):
        y = x
        for i in range(6):
            y = snake_alias_cm_pallas(y * 0.999, al + i * 1e-6, be + i * 1e-6)
        return y

    def conv(y):
        return jax.lax.conv_general_dilated(
            y, kern, (1,), [(1, 1)], dimension_numbers=("NCH", "HIO", "NCH"))

    def case_c(x):
        y = x
        for _ in range(6):
            y = conv(snake_alias_cm_pallas(y, al, be)) * 0.2
        return y

    def case_d(x):
        y = x
        for _ in range(6):
            z = snake_alias_cm_pallas(y, al, be)
            y = z * 0.9 + jnp.tanh(z) * 0.1
        return y

    run_case("A_same_backtoback", case_a, x)
    run_case("B_distinct_backtoback", case_b, x)
    run_case("C_interleave_conv", case_c, x)
    run_case("D_interleave_elementwise", case_d, x)


if __name__ == "__main__":
    main()
