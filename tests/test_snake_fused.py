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
