"""F0 quantization utilities (reference vits/utils.py:13-33)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1.0 + F0_MAX / 700.0)


def f0_to_coarse(f0):
    """Mel-scale quantization of F0 into bins 1..255 (0 = unvoiced).

    Accepts jnp or np arrays; matches reference vits/utils.py:21-33 including
    the round-half-up via floor(x + 0.5).
    """
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    f0_mel = 1127.0 * xp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1.0
    f0_mel = xp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = xp.where(f0_mel <= 1, 1.0, f0_mel)
    f0_mel = xp.where(f0_mel > F0_BIN - 1, float(F0_BIN - 1), f0_mel)
    coarse = xp.floor(f0_mel + 0.5).astype(xp.int32)
    return coarse
