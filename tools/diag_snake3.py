"""Reproduce the in-decoder snake-call inflation with a single AMPBlock.

diag_snake2 showed the kernel at 0.657 ms/call when interleaved with plain
convs or elementwise ops, yet the full decoder trace shows 1.3 ms/call.
This bench runs ONE real AMPBlock (layout=NCT, pallas snakes) at the
stage-4 shape and prints the span table; variants bisect the trigger.

Usage: python tools/diag_snake3.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.trace_train import breakdown, load_trace  # noqa: E402


def run_case(name, mod, x, extra_args=()):
    import jax

    p = jax.jit(mod.init)(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def fn(p, x):
        return mod.apply({"params": p}, x)

    jax.block_until_ready(fn(p, x))
    trace_dir = tempfile.mkdtemp(prefix=f"snake3_{name}_")
    jax.profiler.start_trace(trace_dir)
    o = None
    for i in range(3):
        o = fn(p, x + i * 1e-5)
    jax.block_until_ready(o)
    jax.profiler.stop_trace()
    step_ms, n, ops = breakdown(load_trace(trace_dir), step_prefix="jit_fn")
    print(f"\n== {name}: {step_ms:.2f} ms/call ({n} calls)")
    for op, us in ops[:10]:
        print(f"   {op[:56]:56s} {us / 1e3 / max(n, 1):8.3f} ms")
    return step_ms


def main():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.nn.amp import AMPBlock
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    c, t = 10, 806400
    x = jnp.asarray(rng.standard_normal((1, c, t)), jnp.float32) * 0.1

    # the real thing: k=3 resblock, NCT, pallas snakes
    run_case("amp_k3_nct_pallas",
             AMPBlock(c, 3, layout="NCT", pallas_snake=True), x)
    # jnp snakes for comparison
    run_case("amp_k3_nct_jnp",
             AMPBlock(c, 3, layout="NCT", pallas_snake=False), x)
    # k=11 (resblocks_14 uses k=11 — wider halo)
    run_case("amp_k11_nct_pallas",
             AMPBlock(c, 11, layout="NCT", pallas_snake=True), x)




def fused():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.nn.amp import AMPBlock
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    for c, t in [(10, 806400), (20, 403200)]:
        x = jnp.asarray(rng.standard_normal((1, c, t)), jnp.float32) * 0.1
        for k in (3, 7, 11):
            run_case(f"amp_k{k}_c{c}_fused_iter",
                     AMPBlock(c, k, layout="NCT", pallas_snake=True,
                              pallas_fused_iter=True), x)
            run_case(f"amp_k{k}_c{c}_pallas",
                     AMPBlock(c, k, layout="NCT", pallas_snake=True), x)


if __name__ == "__main__":
    import sys as _s
    fused() if "--fused" in _s.argv else main()
