"""Gradient-reversal speaker adversary.

The reference implements GRL with a torch autograd.Function
(vits/modules_grl.py:11-39); the JAX-native form is a custom_vjp identity
whose cotangent is scaled by -lambda. SpeakerClassifier mirrors
vits/modules_grl.py:42-63: three weight-norm k=5 convs with ReLU, then a
time-mean to predict the speaker embedding from the prior-encoder hidden.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv1d


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x: jax.Array, lambda_: float = 1.0) -> jax.Array:
    return x


def _grl_fwd(x, lambda_):
    return x, None


def _grl_bwd(lambda_, _res, g):
    return (-lambda_ * g,)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


class SpeakerClassifier(nn.Module):
    embed_dim: int
    spk_dim: int
    lambda_reversal: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, T, embed_dim] -> [B, spk_dim] speaker prediction."""
        x = gradient_reversal(x, self.lambda_reversal)
        x = Conv1d(self.embed_dim, 5, padding=2, weight_norm=True, name="conv_0")(x)
        x = jax.nn.relu(x)
        x = Conv1d(self.embed_dim, 5, padding=2, weight_norm=True, name="conv_1")(x)
        x = jax.nn.relu(x)
        x = Conv1d(self.spk_dim, 5, padding=2, weight_norm=True, name="conv_2")(x)
        return jnp.mean(x, axis=1)
