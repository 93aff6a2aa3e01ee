"""MSD per-layer fwd+bwd timing (VERDICT r4 next #3 groundwork).

The roofline audit pinned MSD at 3.4% of its memory bound with the time in
the convolution op class; this tool attributes it per LAYER (fwd+bwd via a
sum-of-squares pseudo-loss) so the Pallas direct-form kernel targets the
layers that actually carry the 4.9 ms.

Usage: python tools/diag_msd.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SPECS = [
    dict(features=16, kernel_size=15, stride=1, padding=7, groups=1),
    dict(features=64, kernel_size=41, stride=4, padding=20, groups=4),
    dict(features=256, kernel_size=41, stride=4, padding=20, groups=16),
    dict(features=1024, kernel_size=41, stride=4, padding=20, groups=64),
    dict(features=1024, kernel_size=41, stride=4, padding=20, groups=256),
    dict(features=1024, kernel_size=5, stride=1, padding=2, groups=1),
]


def main():
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.nn.conv import Conv1d
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache
    from whisper_vits_svc_tpu.utils.device_trace import measure_device_ms

    enable_compile_cache()
    rng = np.random.default_rng(0)
    b, t0 = 16, 8000  # fake||real concatenated batch at segment 8000

    # per-layer standalone fwd+bwd
    t = t0
    cin = 1
    for i, s in enumerate(SPECS):
        x = jnp.asarray(rng.standard_normal((b, t, cin)), jnp.float32) * 0.1
        layer = Conv1d(weight_norm=True, **s)
        p = layer.init(jax.random.PRNGKey(i), x)["params"]

        def loss(p, x):
            y = jax.nn.leaky_relu(layer.apply({"params": p}, x), 0.1)
            return jnp.sum(jnp.square(y)), y.shape

        grad = jax.jit(jax.grad(lambda p, x: loss(p, x)[0], argnums=(0, 1)))
        jax.block_until_ready(grad(p, x))

        def run(grad=grad, p=p, x=x):
            o = None
            for j in range(4):
                o = grad(p, x + j * 1e-5)
            jax.block_until_ready(o)

        ms = measure_device_ms(run, "jit_")
        t_out = (t + 2 * s["padding"] - s["kernel_size"]) // s["stride"] + 1
        flops = (2 * s["features"] * (cin // s["groups"]) * s["kernel_size"]
                 * t_out * b) * 3  # fwd + dx + dw
        print(f"L{i} {cin:4d}->{s['features']:4d} k{s['kernel_size']:2d} "
              f"s{s['stride']} g{s['groups']:3d} T{t:5d}: "
              f"{ms if ms is not None else float('nan'):7.3f} ms  "
              f"({flops / 1e9:5.2f} GF fwd+bwd)", flush=True)
        cin, t = s["features"], t_out




def whole(merge: bool):
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.models.discriminator import ScaleDiscriminator
    from whisper_vits_svc_tpu.utils.device_trace import measure_device_ms

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 8000, 1)), jnp.float32) * 0.1
    mod = ScaleDiscriminator(merge_groups=merge)
    p = mod.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, x):
        fmap, score = mod.apply({"params": p}, x)
        return sum(jnp.sum(jnp.abs(f)) for f in fmap) + jnp.sum(jnp.square(score))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    jax.block_until_ready(grad(p, x))

    def run():
        o = None
        for j in range(4):
            o = grad(p, x + j * 1e-5)
        jax.block_until_ready(o)

    ms = measure_device_ms(run, "jit_")
    print(f"MSD fwd+bwd b16 merge={merge}: {ms:.3f} ms", flush=True)


def main_whole():
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    whole(False)
    whole(True)
    whole(False)
    whole(True)


if __name__ == "__main__":
    import sys as _s
    main_whole() if "--whole" in _s.argv else main()


if __name__ == "__main__":
    import sys as _s
    main_whole() if "--whole" in _s.argv else main()
