"""Buffer-aliasing probe for the in-graph snake premium.

Standalone the kernel runs 0.75 ms; in AMP composition 1.30. One remaining
mechanism: HBM buffer placement/aliasing effects for intermediate buffers
vs fresh jit-argument buffers. Probes:
  A. plain standalone (argument input, fresh output)
  B. donated input (XLA may place output in the donated buffer)
  C. input produced by a trivial on-device op (intermediate buffer)
  D. chain like AMP's residual: out consumed by add with another live tensor
Usage: python tools/diag_snake4.py
"""
import os, sys, tempfile
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.trace_train import breakdown, load_trace  # noqa: E402


def measure(name, jfn, args_fn):
    import jax
    jax.block_until_ready(jfn(*args_fn(0)))
    trace_dir = tempfile.mkdtemp(prefix=f"snake4_{name}_")
    jax.profiler.start_trace(trace_dir)
    o = None
    for i in range(1, 4):
        o = jfn(*args_fn(i))
    jax.block_until_ready(o)
    jax.profiler.stop_trace()
    step_ms, n, ops = breakdown(load_trace(trace_dir), step_prefix="jit_")
    tot = {k: v / 1e3 / max(n, 1) for k, v in ops[:4]}
    print(f"== {name}: {step_ms:.3f} ms/call  {tot}")


def main():
    import jax
    import jax.numpy as jnp
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    rng = np.random.default_rng(0)
    c, t = 10, 806400
    x0 = np.asarray(rng.standard_normal((1, c, t)), np.float32) * 0.1
    al = jnp.zeros((c,)); be = jnp.zeros((c,))

    f_plain = jax.jit(lambda x: snake_alias_cm_pallas(x, al, be))
    measure("A_plain", f_plain, lambda i: (jnp.asarray(x0 + i * 1e-5),))

    f_don = jax.jit(lambda x: snake_alias_cm_pallas(x, al, be),
                    donate_argnums=(0,))
    measure("B_donated", f_don, lambda i: (jnp.asarray(x0 + i * 1e-5),))

    f_mid = jax.jit(lambda x: snake_alias_cm_pallas(x * 1.000001, al, be))
    measure("C_intermediate", f_mid, lambda i: (jnp.asarray(x0 + i * 1e-5),))

    f_res = jax.jit(
        lambda x: snake_alias_cm_pallas(x * 1.000001, al, be) + x)
    measure("D_residual_live_input", f_res,
            lambda i: (jnp.asarray(x0 + i * 1e-5),))

    # E: two chained snakes with a shifted-slice conv-like consumer between
    k = jnp.asarray(rng.standard_normal((3, c, c)), jnp.float32) * 0.1
    def cm_conv(y):
        yp = jnp.pad(y, ((0, 0), (0, 0), (1, 1)))
        out = jnp.zeros_like(y)
        for tap in range(3):
            out = out + jnp.einsum("io,bit->bot", k[tap], yp[:, :, tap:tap + t])
        return out
    f_conv = jax.jit(
        lambda x: cm_conv(snake_alias_cm_pallas(x, al, be)))
    measure("E_shifted_slice_consumer", f_conv,
            lambda i: (jnp.asarray(x0 + i * 1e-5),))




def caps():
    """True single-call cost across tile caps (the diag_snake sweep was
    diluted by averaging over the input-perturbation add spans)."""
    import jax
    import jax.numpy as jnp
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    rng = np.random.default_rng(0)
    c, t = 10, 806400
    x0 = np.asarray(rng.standard_normal((1, c, t)), np.float32) * 0.1
    al = jnp.zeros((c,)); be = jnp.zeros((c,))
    for cap in (None, 1024, 2048, 4096, 8064):
        f = jax.jit(lambda x, cap=cap: snake_alias_cm_pallas(
            x, al, be, tile_cap=cap))
        measure(f"cap_{cap}", f, lambda i: (jnp.asarray(x0 + i * 1e-5),))
    # pure chain: marginal cost of an adjacent call
    for n in (2, 4, 8):
        f = jax.jit(lambda x, n=n: [
            x := snake_alias_cm_pallas(x, al, be) for _ in range(n)][-1])
        measure(f"chain_{n}", f, lambda i: (jnp.asarray(x0 + i * 1e-5),))




def subl():
    """Sublane-alignment probe: c=10/20 (the decoder's tail stages) are not
    multiples of 8, so every (8,128) DMA tile is partial. Measure c=16/24."""
    import jax
    import jax.numpy as jnp
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    rng = np.random.default_rng(0)
    for c, t in [(10, 806400), (16, 806400), (20, 403200), (24, 403200),
                 (8, 806400)]:
        x0 = np.asarray(rng.standard_normal((1, c, t)), np.float32) * 0.1
        al = jnp.zeros((c,)); be = jnp.zeros((c,))
        f = jax.jit(lambda x, al=al, be=be: snake_alias_cm_pallas(x, al, be))
        measure(f"single_c{c}_t{t}", f, lambda i: (jnp.asarray(x0 + i * 1e-5),))




def strips():
    """A/B: strip-folded kernel vs plain at the decoder stage shapes."""
    import jax
    import jax.numpy as jnp
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    rng = np.random.default_rng(0)
    for c, t in [(10, 806400), (20, 403200), (10, 320000), (20, 160000)]:
        x0 = np.asarray(rng.standard_normal((1, c, t)), np.float32) * 0.1
        al = jnp.zeros((c,)); be = jnp.zeros((c,))
        for mode in (False, True):
            f = jax.jit(lambda x, m=mode: snake_alias_cm_pallas(
                x, al, be, strips=m))
            measure(f"c{c}_t{t}_strips{int(mode)}", f,
                    lambda i: (jnp.asarray(x0 + i * 1e-5),))


if __name__ == "__main__":
    import sys as _s
    if "--caps" in _s.argv:
        caps()
    elif "--subl" in _s.argv:
        subl()
    elif "--strips" in _s.argv:
        strips()
    else:
        main()
