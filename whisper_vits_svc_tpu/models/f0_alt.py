"""Alternative F0 engines: vectorized YIN and pYIN.

The reference vendors a pure-NumPy/numba pitch library (pitch/core/{yin,pyin,
swipe,...}.py, libf0-style) plus optional binary engines (pyworld DIO,
praat-parselmouth) as alternatives to CREPE (SURVEY.md §2.5, §2.9). Here the
same capability is provided TPU-first:

  * YIN (de Cheveigne & Kawahara 2002): the O(T * N * L) per-frame difference
    function is computed for ALL frames at once via FFT autocorrelation on
    device — no numba JIT, no python frame loop,
  * pYIN (Mauch & Dixon 2014): multi-threshold YIN candidates with a
    beta-distributed threshold prior, decoded by the same banded-transition
    Viterbi machinery as our CREPE decoder.

Both return (f0, confidence/voicing) at the hop rate, hop 160 @ 16 kHz by
default to slot into the same `.pit.npy` cache as CREPE.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _frame(x: np.ndarray, frame_length: int, hop: int) -> np.ndarray:
    n = 1 + max(0, (len(x) - frame_length)) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[idx]


@partial(jax.jit, static_argnames=("lag_max",))
def _cmndf(frames: jax.Array, lag_max: int) -> jax.Array:
    """Cumulative mean-normalized difference for all frames. [T, N] -> [T, lag_max+1]."""
    T, N = frames.shape
    nfft = int(2 ** np.ceil(np.log2(2 * N)))
    spec = jnp.fft.rfft(frames, nfft)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), nfft)[:, : lag_max + 1]  # [T, L+1]
    # energy terms e(tau) = sum_{j<N-tau} x_j^2 ; e'(tau) = sum_{j>=tau} x_j^2
    csum = jnp.cumsum(frames**2, axis=1)
    total = csum[:, -1:]
    tau = jnp.arange(lag_max + 1)
    e_head = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros_like(total), csum], axis=1),
        (N - tau)[None, :].repeat(T, 0), axis=1,
    )
    e_tail = total - jnp.take_along_axis(
        jnp.concatenate([jnp.zeros_like(total), csum], axis=1),
        tau[None, :].repeat(T, 0), axis=1,
    )
    d = e_head + e_tail - 2.0 * ac
    d = jnp.maximum(d, 0.0)
    # CMNDF: d(tau) * tau / cumsum(d)(tau), d(0) = 1. Degenerate (silent)
    # frames have d ~ 0 everywhere; define cmndf = 1 there so no threshold
    # fires and the frame reads as unvoiced.
    dcum = jnp.cumsum(d[:, 1:], axis=1)
    cmndf = jnp.where(
        dcum > 1e-9,
        d[:, 1:] * jnp.arange(1, lag_max + 1) / jnp.maximum(dcum, 1e-12),
        1.0,
    )
    return jnp.concatenate([jnp.ones((T, 1)), cmndf], axis=1)


def _parabolic_refine(cmndf: np.ndarray, tau: np.ndarray) -> np.ndarray:
    """Sub-sample lag refinement around the chosen minimum."""
    T, L = cmndf.shape
    t0 = np.clip(tau - 1, 0, L - 1)
    t2 = np.clip(tau + 1, 0, L - 1)
    y0 = cmndf[np.arange(T), t0]
    y1 = cmndf[np.arange(T), tau]
    y2 = cmndf[np.arange(T), t2]
    denom = y0 - 2 * y1 + y2
    offset = np.where(np.abs(denom) > 1e-12, 0.5 * (y0 - y2) / np.where(np.abs(denom) > 1e-12, denom, 1.0), 0.0)
    return tau + np.clip(offset, -1.0, 1.0)


def _absolute_threshold(region: np.ndarray, threshold: float) -> np.ndarray:
    """YIN absolute thresholding, vectorized over frames.

    First lag with cmndf < threshold, then walk downhill to the local minimum
    (de Cheveigne step 4); falls back to the global argmin when nothing dips
    below the threshold.
    """
    T, L = region.shape
    below = region < threshold
    has_below = below.any(axis=1)
    first = np.argmax(below, axis=1)
    nxt = np.concatenate([region[:, 1:], np.full((T, 1), np.inf)], axis=1)
    is_local_min = nxt >= region
    idxs = np.arange(L)[None, :]
    candidates = (idxs >= first[:, None]) & is_local_min
    walked = np.argmax(candidates, axis=1)
    return np.where(has_below, walked, np.argmin(region, axis=1))


def yin(
    x: np.ndarray,
    fs: int = 16000,
    frame_length: int = 2048,
    hop: int = 160,
    fmin: float = 55.0,
    fmax: float = 1000.0,
    threshold: float = 0.15,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (f0 [T], aperiodicity-confidence [T]); f0=0 where no valid lag."""
    lag_min = max(int(fs / fmax), 2)
    lag_max = min(int(fs / fmin), frame_length - 1)
    frames = _frame(np.asarray(x, np.float32), frame_length, hop)
    cmndf = np.asarray(_cmndf(jnp.asarray(frames), lag_max))
    T = len(frames)

    region = cmndf[:, lag_min : lag_max + 1]
    best = _absolute_threshold(region, threshold) + lag_min
    tau = _parabolic_refine(cmndf, best)
    f0 = fs / np.maximum(tau, 1e-6)
    conf = 1.0 - cmndf[np.arange(T), best]
    f0 = np.where((f0 >= fmin) & (f0 <= fmax), f0, 0.0)
    return f0.astype(np.float32), conf.astype(np.float32)


def _beta_weights(thresholds: np.ndarray, a: float = 2.0, b: float = 18.0) -> np.ndarray:
    """Beta(2, 18) prior over YIN thresholds (pYIN paper / pitch/core/pyin.py)."""
    from scipy.stats import beta as beta_distr

    pdf = beta_distr.pdf(thresholds, a, b)
    return pdf / pdf.sum()


def pyin(
    x: np.ndarray,
    fs: int = 16000,
    frame_length: int = 2048,
    hop: int = 160,
    fmin: float = 55.0,
    fmax: float = 1000.0,
    n_thresholds: int = 100,
    bins_per_semitone: int = 10,
    switch_prob: float = 0.01,
) -> tuple[np.ndarray, np.ndarray]:
    """Probabilistic YIN -> (f0 [T], voiced-probability [T]).

    Candidate lags from every threshold level, weighted by the beta prior and
    the 'boltzmann' voicing assumption; decoded over a log-spaced pitch grid
    with a triangular-transition HMM (viterbi on device via lax.scan).
    """
    lag_min = max(int(fs / fmax), 2)
    lag_max = min(int(fs / fmin), frame_length - 1)
    frames = _frame(np.asarray(x, np.float32), frame_length, hop)
    cmndf = np.asarray(_cmndf(jnp.asarray(frames), lag_max))
    T = len(frames)

    thresholds = np.linspace(0.01, 1.0, n_thresholds, endpoint=False)
    weights = _beta_weights(thresholds)

    # pitch grid in cents
    n_bins = int(np.ceil(12 * bins_per_semitone * np.log2(fmax / fmin))) + 1
    grid_hz = fmin * 2 ** (np.arange(n_bins) / (12 * bins_per_semitone))

    region = cmndf[:, lag_min : lag_max + 1]  # [T, L]
    # first local-minimum-below-threshold per threshold level, vectorized:
    # candidate = argfirst(region < thr); fallback argmin
    obs = np.zeros((T, n_bins), np.float64)
    argmin_lag = np.argmin(region, axis=1) + lag_min
    for thr, w in zip(thresholds, weights):
        below = region < thr
        has = below.any(axis=1)
        lag = np.where(has, _absolute_threshold(region, thr) + lag_min, argmin_lag)
        f0_cand = fs / np.maximum(_parabolic_refine(cmndf, lag), 1e-6)
        valid = (f0_cand >= fmin) & (f0_cand <= fmax)
        bin_idx = np.clip(
            np.round(12 * bins_per_semitone * np.log2(np.maximum(f0_cand, fmin) / fmin)),
            0, n_bins - 1,
        ).astype(np.int64)
        # voiced prob mass only where the threshold actually fired
        contrib = w * np.where(has & valid, 1.0, 0.0)
        np.add.at(obs, (np.arange(T), bin_idx), contrib)

    voiced_prob = obs.sum(axis=1)
    # states: [voiced bins ; unvoiced bins] (2 * n_bins)
    eps = 1e-10
    observation = np.concatenate(
        [obs + eps, ((1.0 - voiced_prob) / n_bins)[:, None].repeat(n_bins, 1) + eps],
        axis=1,
    )
    # triangular pitch transition, coupled voiced<->unvoiced switch
    max_jump = bins_per_semitone * 4
    xx, yy = np.meshgrid(np.arange(n_bins), np.arange(n_bins))
    tri = np.maximum(max_jump - np.abs(xx - yy), 0).astype(np.float64)
    tri /= tri.sum(axis=1, keepdims=True)
    A = np.block([
        [(1 - switch_prob) * tri, switch_prob * tri],
        [switch_prob * tri, (1 - switch_prob) * tri],
    ])

    path = _viterbi_generic(observation, A)
    voiced = path < n_bins
    f0 = np.where(voiced, grid_hz[path % n_bins], 0.0)
    return f0.astype(np.float32), voiced_prob.astype(np.float32)


def _viterbi_generic(obs: np.ndarray, transition: np.ndarray) -> np.ndarray:
    log_obs = np.log(np.maximum(obs, 1e-30))
    log_t = jnp.log(jnp.asarray(np.maximum(transition, 1e-30)))
    S = obs.shape[1]

    @jax.jit
    def trellis(log_obs_j):
        init = log_obs_j[0] + jnp.log(1.0 / S)

        def step(value, o):
            scores = value[:, None] + log_t
            return jnp.max(scores, axis=0) + o, jnp.argmax(scores, axis=0)

        return jax.lax.scan(step, init, log_obs_j[1:])

    final, ptrs = trellis(jnp.asarray(log_obs))
    final, ptrs = np.asarray(final), np.asarray(ptrs)
    T = len(obs)
    path = np.empty(T, np.int64)
    path[-1] = int(final.argmax())
    for t in range(T - 2, -1, -1):
        path[t] = ptrs[t, path[t + 1]]
    return path
