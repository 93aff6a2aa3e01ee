"""Polyphase ConvTranspose1d == lhs-dilated lowering == torch semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from whisper_vits_svc_tpu.nn.conv import ConvTranspose1d


@pytest.mark.parametrize("K,s,pad,I,O", [
    (15, 5, 5, 8, 4), (8, 4, 2, 6, 3), (4, 2, 1, 5, 5), (16, 8, 4, 3, 2),
    (9, 3, 3, 4, 4),
])
def test_polyphase_matches_torch(rng, K, s, pad, I, O):
    x = rng.standard_normal((2, 30, I)).astype(np.float32)
    ref_conv = torch.nn.ConvTranspose1d(I, O, K, s, padding=pad, bias=True)
    with torch.no_grad():
        ref = ref_conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()

    for poly in (True, False):
        ours = ConvTranspose1d(O, K, stride=s, padding=pad, polyphase=poly)
        params = {
            "kernel": ref_conv.weight.detach().numpy().transpose(2, 0, 1),
            "bias": ref_conv.bias.detach().numpy(),
        }
        y = ours.apply({"params": params}, jnp.asarray(x))
        assert y.shape == (ref.shape[0], ref.shape[2], ref.shape[1]), poly
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5,
            err_msg=f"polyphase={poly}",
        )


def test_polyphase_weight_norm_path(rng):
    x = rng.standard_normal((1, 12, 4)).astype(np.float32)
    a = ConvTranspose1d(6, 8, stride=4, padding=2, weight_norm=True, polyphase=True)
    b = ConvTranspose1d(6, 8, stride=4, padding=2, weight_norm=True, polyphase=False)
    params = a.init(jax.random.PRNGKey(0), x)["params"]
    ya = a.apply({"params": params}, jnp.asarray(x))
    yb = b.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-5, atol=1e-6)
