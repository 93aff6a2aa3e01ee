"""Fused polyphase SnakeAlias == literal reference op chain (incl. edges)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_vits_svc_tpu.nn.snake import (
    SnakeAlias, SnakeBeta, _np_downsample, _np_upsample, downsample1d,
    snake_alias_fused, upsample1d,
)


def test_np_resamplers_match_jax(rng):
    x = rng.standard_normal(200).astype(np.float32)
    up_j = np.asarray(upsample1d(jnp.asarray(x)[None, :, None]))[0, :, 0]
    up_n = _np_upsample(x)
    assert up_j.shape == up_n.shape
    np.testing.assert_allclose(up_j, up_n, atol=1e-5)

    y = rng.standard_normal(400).astype(np.float32)
    dn_j = np.asarray(downsample1d(jnp.asarray(y)[None, :, None]))[0, :, 0]
    dn_n = _np_downsample(y)
    assert dn_j.shape == dn_n.shape
    np.testing.assert_allclose(dn_j, dn_n, atol=1e-5)


@pytest.mark.parametrize("T,C", [(64, 4), (161, 10), (320, 3)])
def test_snake_fused_matches_reference(rng, T, C):
    x = (rng.standard_normal((2, T, C)) * 1.5).astype(np.float32)
    alpha = rng.standard_normal(C).astype(np.float32) * 0.3
    beta = rng.standard_normal(C).astype(np.float32) * 0.3

    a = jnp.exp(jnp.asarray(alpha))
    b = jnp.exp(jnp.asarray(beta))
    up = upsample1d(jnp.asarray(x))
    act = up + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(up * a))
    ref = np.asarray(downsample1d(act))

    fused = np.asarray(
        snake_alias_fused(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta))
    )
    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_snake_alias_module_fused_vs_unfused(rng):
    x = (rng.standard_normal((1, 100, 6)) * 0.8).astype(np.float32)
    fused_mod = SnakeAlias(6, fused=True)
    plain_mod = SnakeAlias(6, fused=False)
    params = fused_mod.init(jax.random.PRNGKey(0), x)["params"]
    # identical param trees -> checkpoints interchangeable
    params2 = plain_mod.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
    # nonzero snake params to exercise the nonlinearity
    params = jax.tree.map(lambda p: p + 0.2, params)
    out_f = fused_mod.apply({"params": params}, x)
    out_p = plain_mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-4, atol=1e-5)


def test_channel_major_conv_exact_vs_f64():
    """The NCT conv path must be f32-exact against a float64 reference (the
    NHC conv path goes through XLA's bf16 MXU passes and is NOT)."""
    import jax
    from whisper_vits_svc_tpu.nn.conv import Conv1d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 64)), jnp.float32)  # [B,C,T]
    for k, d in [(3, 1), (3, 5), (7, 1), (11, 1)]:
        pad = (k * d - d) // 2
        conv = Conv1d(8, k, dilation=d, padding=pad, weight_norm=True, layout="NCT")
        p = conv.init(jax.random.PRNGKey(0), x)
        y = np.asarray(conv.apply(p, x))
        v = np.asarray(p["params"]["v"], np.float64)
        g = np.asarray(p["params"]["g"], np.float64)
        w = g * v / (np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True)) + 1e-12)
        b = np.asarray(p["params"]["bias"], np.float64)
        xp = np.pad(np.asarray(x, np.float64), ((0, 0), (0, 0), (pad, pad)))
        t_out = x.shape[-1]
        ref = sum(np.einsum("io,bit->bot", w[m], xp[:, :, m * d : m * d + t_out])
                  for m in range(k)) + b[None, :, None]
        np.testing.assert_allclose(y, ref, atol=1e-5)


def test_channel_major_snake_matches_ntc():
    from whisper_vits_svc_tpu.nn.snake import snake_alias_fused, snake_alias_fused_cm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 96, 6)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    for exact in (True, False):
        a = snake_alias_fused(x, alpha, beta, exact_edges=exact)
        b = snake_alias_fused_cm(x.transpose(0, 2, 1), alpha, beta,
                                 exact_edges=exact).transpose(0, 2, 1)
        # NTC depthwise convs may take bf16 MXU passes; CM is f32-exact
        np.testing.assert_allclose(a, b, atol=2e-2)
        assert a.shape == b.shape


@pytest.mark.slow
def test_generator_channel_major_matches_ntc():
    import jax
    from whisper_vits_svc_tpu.models.generator import Generator

    rng = np.random.default_rng(0)
    kw = dict(upsample_input=32, upsample_initial_channel=32,
              upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
              resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
              spk_dim=16, sampling_rate=3200)
    g_cm = Generator(**kw, channel_major_amp=True)
    g_nh = Generator(**kw, channel_major_amp=False)
    spk = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 20, 32)), jnp.float32) * 0.3
    f0 = jnp.asarray(rng.uniform(100, 300, (2, 20)), jnp.float32)
    p = g_cm.init(jax.random.PRNGKey(0), spk, x, f0)
    # identical param pytree -> checkpoints are layout-independent
    p2 = g_nh.init(jax.random.PRNGKey(0), spk, x, f0)
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape, p, p2))
    y1 = g_cm.apply(p, spk, x, f0)
    y2 = g_nh.apply(p, spk, x, f0)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(y1, y2, atol=3e-2)


def test_pallas_snake_matches_cm():
    """Pallas single-pass kernel (interpret mode off-TPU) == jnp CM form,
    including the replicate-edge clamps and non-tile-aligned T."""
    from whisper_vits_svc_tpu.nn.snake import snake_alias_fused_cm
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas

    rng = np.random.default_rng(2)
    for (B, C, T) in [(1, 10, 700), (2, 16, 1024), (1, 3, 130)]:
        x = jnp.asarray(rng.standard_normal((B, C, T)) * 1.5, jnp.float32)
        alpha = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
        ref = snake_alias_fused_cm(x, alpha, beta, exact_edges=True)
        out = snake_alias_cm_pallas(x, alpha, beta)
        np.testing.assert_allclose(out, ref, atol=5e-6, rtol=1e-5)


def test_pallas_snake_gradient_parity():
    """custom_vjp of the Pallas kernel (rematerialized jnp backward) matches
    jax.grad of the jnp CM form for x, alpha and beta."""
    from whisper_vits_svc_tpu.nn.snake import snake_alias_fused_cm
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas_diff

    rng = np.random.default_rng(7)
    B, C, T = 2, 10, 700
    x = jnp.asarray(rng.standard_normal((B, C, T)) * 1.5, jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)

    def loss_ref(x, a, b):
        return jnp.sum(w * snake_alias_fused_cm(x, a, b, exact_edges=True))

    def loss_pal(x, a, b):
        return jnp.sum(w * snake_alias_cm_pallas_diff(x, a, b))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, alpha, beta)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, alpha, beta)
    for r, p in zip(g_ref, g_pal):
        np.testing.assert_allclose(p, r, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("B,C,T", [(1, 10, 700), (2, 16, 1024), (1, 3, 130),
                                   (2, 20, 4000)])
def test_pallas_snake_bwd_kernel_parity(B, C, T):
    """The analytic backward kernel (interpret mode off-TPU) == jax.grad of
    the jnp CM form for dx, dalpha, dbeta — including the extension clamps
    and edge-replicate pad adjoints, multi-tile T, and padded channels."""
    from whisper_vits_svc_tpu.nn.snake import snake_alias_fused_cm
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas_bwd

    rng = np.random.default_rng(C * T)
    x = jnp.asarray(rng.standard_normal((B, C, T)) * 1.5, jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)

    def loss(x, a, b):
        return jnp.sum(dy * snake_alias_fused_cm(x, a, b, exact_edges=True))

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, alpha, beta)
    g_ker = snake_alias_cm_pallas_bwd(x, alpha, beta, dy)
    for r, p in zip(g_ref, g_ker):
        np.testing.assert_allclose(p, r, atol=3e-4, rtol=2e-4)


@pytest.mark.slow
def test_generator_pallas_snake_matches_jnp(monkeypatch):
    """Full generator with pallas_snake=True (interpret mode on CPU) matches
    the jnp CM path; params are identical between the two. The shape gate is
    lifted so the tiny test shapes actually take the kernel."""
    import jax
    from whisper_vits_svc_tpu.ops import pallas_snake

    monkeypatch.setattr(pallas_snake, "_MIN_T", 0)
    monkeypatch.setattr(pallas_snake, "use_pallas_for", lambda c, t, b=1: True)
    from whisper_vits_svc_tpu.models.generator import Generator

    rng = np.random.default_rng(3)
    kw = dict(upsample_input=32, upsample_initial_channel=32,
              upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
              resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
              spk_dim=16, sampling_rate=3200)
    g_ref = Generator(**kw)
    g_pal = Generator(**kw, pallas_snake=True)
    spk = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 20, 32)), jnp.float32) * 0.3
    f0 = jnp.asarray(rng.uniform(100, 300, (2, 20)), jnp.float32)
    p = g_ref.init(jax.random.PRNGKey(0), spk, x, f0)
    y1 = g_ref.apply(p, spk, x, f0)
    y2 = g_pal.apply(p, spk, x, f0)
    np.testing.assert_allclose(y1, y2, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_amp_iter_kernel_matches_ref():
    """Fused AMP dilation-iteration kernel == jnp composition, incl. conv
    zero-pad and snake edge-replicate boundary semantics, every AMP kernel
    size in the base config."""
    from whisper_vits_svc_tpu.ops import pallas_amp as pa

    rng = np.random.default_rng(4)
    for (B, C, T, k, d) in [(1, 10, 1280, 3, 1), (2, 16, 1024, 7, 3),
                            (1, 12, 2560, 11, 5)]:
        x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)
        k1 = jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, jnp.float32)
        k2 = jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
        a1, be1, a2, be2 = (jnp.asarray(rng.standard_normal(C) * 0.3,
                                        jnp.float32) for _ in range(4))
        ref = pa.amp_iter_ref(x, k1, b1, a1, be1, k2, b2, a2, be2, k, d)
        out = pa.amp_iter(x, k1, b1, a1, be1, k2, b2, a2, be2, k, d,
                          interpret=True)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_ampblock_fused_iter_matches_module(monkeypatch):
    """AMPBlock with the fused-iteration path (gate lifted) == the module
    composition, with an identical parameter tree."""
    import jax
    from whisper_vits_svc_tpu.nn.amp import AMPBlock
    from whisper_vits_svc_tpu.ops import pallas_amp

    monkeypatch.setattr(pallas_amp, "use_fused_iter", lambda c, t, b=1: True)
    rng = np.random.default_rng(5)
    C, T = 12, 1280
    x = jnp.asarray(rng.standard_normal((1, C, T)), jnp.float32)
    block_ref = AMPBlock(C, 3, (1, 3), layout="NCT")
    block_pal = AMPBlock(C, 3, (1, 3), layout="NCT", pallas_fused_iter=True)
    p_ref = block_ref.init(jax.random.PRNGKey(0), x)
    p_pal = block_pal.init(jax.random.PRNGKey(0), x)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: a.shape == b.shape and bool(jnp.allclose(a, b)),
        p_ref, p_pal))
    y_ref = block_ref.apply(p_ref, x)
    y_pal = block_pal.apply(p_ref, x)
    np.testing.assert_allclose(y_pal, y_ref, atol=2e-5, rtol=1e-5)


def test_pallas_snake_bf16_io():
    """--bf16 inference casts activations to bfloat16; the kernel must accept
    bf16 in/out (computing in f32 internally) on both call paths."""
    from whisper_vits_svc_tpu.nn.snake import snake_alias_fused_cm
    from whisper_vits_svc_tpu.ops.pallas_snake import snake_alias_cm_pallas

    rng = np.random.default_rng(6)
    for (B, C, T) in [(1, 10, 1024), (1, 6, 700)]:  # nocopy + padded paths
        x32 = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)
        x = x32.astype(jnp.bfloat16)
        alpha = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
        out = snake_alias_cm_pallas(x, alpha, beta)
        assert out.dtype == jnp.bfloat16
        ref = snake_alias_fused_cm(x32, alpha, beta, exact_edges=True)
        np.testing.assert_allclose(out.astype(jnp.float32), ref,
                                   atol=0.05, rtol=0.05)


def test_pallas_snake_strips_matches_cm(rng):
    """Strip-folded path (time segments stacked on the channel axis for full
    sublane utilization — round-5 long-T win) must match the jnp exact-edge
    form including global edges, at several (c, fold) geometries."""
    from whisper_vits_svc_tpu.nn.snake import snake_alias_fused_cm
    from whisper_vits_svc_tpu.ops.pallas_snake import (
        _strip_fold, snake_alias_cm_pallas,
    )

    for c, t in [(10, 128 * 40), (20, 128 * 50), (6, 128 * 64),
                 (10, 128 * 25)]:
        fold = _strip_fold(c, t)
        assert fold is not None and (c * fold) % 8 == 0 or c == 10
        x = jnp.asarray(rng.standard_normal((2, c, t)), jnp.float32) * 0.5
        alpha = jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.1
        beta = jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.1
        ref = snake_alias_fused_cm(x, alpha, beta, exact_edges=True)
        got = snake_alias_cm_pallas(x, alpha, beta, interpret=True,
                                    strips=True)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
