"""Snake kernel tile sweep at the in-graph 2520-frame stage shapes.

The 2520-frame decoder trace shows each Pallas snake call costing ~1.30 ms
at c=10/T=806400 where the recorded standalone number was 0.75 — this tool
re-measures standalone at the EXACT in-graph shapes across tile caps, to
separate 'kernel is slow at long T' (tile choice) from 'fusion-boundary
overhead around the custom call' (VERDICT r4 next #2).

Usage: python tools/diag_snake.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas
    from whisper_vits_svc_tpu.nn.snake import snake_alias_fused_cm
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    from whisper_vits_svc_tpu.utils.device_trace import measure_device_ms

    enable_compile_cache()
    rng = np.random.default_rng(0)
    shapes = [(10, 806400), (20, 403200), (80, 100800)]
    caps = [None, 2048, 4096, 8064, 16128]

    for c, t in shapes:
        x = jnp.asarray(rng.standard_normal((1, c, t)), jnp.float32) * 0.1
        al = jnp.zeros((c,))
        be = jnp.zeros((c,))

        for cap in caps:
            fn = jax.jit(lambda x, a, b, cap=cap: snake_alias_cm_pallas(
                x, a, b, tile_cap=cap))
            try:
                jax.block_until_ready(fn(x, al, be))
            except Exception as e:
                print(f"c{c} t{t} cap{cap}: failed {e!r}")
                continue

            def run(fn=fn, x=x):
                o = None
                for i in range(6):
                    o = fn(x + i * 1e-5, al, be)
                jax.block_until_ready(o)

            ms = measure_device_ms(run, "jit_")
            print(f"c{c:3d} t{t:7d} cap={str(cap):>6s}: "
                  f"{ms if ms is not None else float('nan'):6.3f} ms", flush=True)

        # jnp CM reference point
        fnj = jax.jit(lambda x, a, b: snake_alias_fused_cm(
            x, a, b, exact_edges=True))
        jax.block_until_ready(fnj(x, al, be))

        def runj(fnj=fnj, x=x):
            o = None
            for i in range(6):
                o = fnj(x + i * 1e-5, al, be)
            jax.block_until_ready(o)

        ms = measure_device_ms(runj, "jit_")
        print(f"c{c:3d} t{t:7d} jnp-cm    : "
              f"{ms if ms is not None else float('nan'):6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
