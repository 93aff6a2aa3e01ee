"""Harmonic-plus-noise NSF excitation source.

Re-designs the reference SineGen/SourceModuleHnNSF (vits_decoder/nsf.py:181-316,
:358-394) around TPU constraints. The reference computes per-sample phase by a
full-length float32 `torch.cumsum` with a mod-1 overflow patch (nsf.py:242-253).
A sequential 800k-sample cumsum is both slow and numerically lossy; here phase
is computed hierarchically and exactly:

  * per-frame phase increment = hop * f0 / sr, split into integer + fraction
    (integers are phase-invariant mod 1),
  * frame-level exclusive cumsum of fractions (<= a few thousand elements,
    tree-reduced by XLA, kept small by mod 1),
  * within-frame linear ramp arange(hop) * f0 / sr.

This is mathematically identical to the reference's cumsum (phase mod 1) with
strictly less float error, and it vectorizes: no sequential dependence over
samples, so XLA emits a short reduce + broadcast instead of an 800k-step chain.

Inputs are frame-rate F0 [B, T_frames] (the reference first nearest-upsamples
x320, generator.py:122-123 — constant within each frame, so frame-rate is the
natural representation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Fixed harmonic-merge weights of the reference (vits_decoder/nsf.py:378-381).
MERGE_W = np.array(
    [
        0.2942, -0.2243, 0.0033, -0.0056, -0.0020, -0.0046,
        0.0221, -0.0083, -0.0241, -0.0036, -0.0581,
    ],
    dtype=np.float32,
)
MERGE_B = np.float32(0.0008)


def sine_harmonics(
    f0_frames: jax.Array,
    hop: int,
    sampling_rate: int,
    harmonic_num: int = 10,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    rng: jax.Array | None = None,
    phase0: jax.Array | None = None,
    return_phase: bool = False,
):
    """[B, T_frames] frame F0 -> [B, T_frames*hop, harmonic_num+1] gated sines.

    Semantics of SineGen.forward (nsf.py:284-316): harmonic k has frequency
    (k+1)*f0; random initial phase per non-fundamental harmonic; unvoiced
    samples are replaced by noise of amplitude sine_amp/3, voiced samples get
    additive noise_std noise. rng=None disables both the random phases and the
    noise (deterministic mode for tests / reproducible inference).

    Streaming: phase0 [B, harmonic_num+1] carries the fractional phase (in
    cycles) from the end of the previous block; return_phase additionally
    returns the end-of-block phase, making block-wise generation exactly
    equal to whole-utterance generation (continuous excitation across
    streaming chunk boundaries).
    """
    B, T = f0_frames.shape
    dim = harmonic_num + 1
    f0 = f0_frames.astype(jnp.float32)[..., None]  # [B, T, 1]
    mult = jnp.arange(1, dim + 1, dtype=jnp.float32)  # harmonics k*f0
    f_h = f0 * mult  # [B, T, dim]

    # per-frame fractional phase increment; integer cycles drop out mod 1
    inc = f_h * (hop / sampling_rate)
    inc_frac = inc - jnp.floor(inc)
    # exclusive cumsum of fractional increments -> phase at frame start
    csum = jnp.cumsum(inc_frac, axis=1)
    start = jnp.zeros((B, 1, dim)) if phase0 is None else phase0[:, None, :]
    frame_base = start + jnp.concatenate(
        [jnp.zeros((B, 1, dim)), csum[:, :-1, :]], axis=1
    )
    frame_base = frame_base - jnp.floor(frame_base)  # keep small for f32
    phase_end = start[:, 0, :] + csum[:, -1, :]
    phase_end = phase_end - jnp.floor(phase_end)

    if rng is not None:
        rng_phase, rng_noise = jax.random.split(rng)
        rand_ini = jax.random.uniform(rng_phase, (B, 1, dim))
        rand_ini = rand_ini.at[:, :, 0].set(0.0)  # fundamental pinned (nsf.py:235)
        frame_base = frame_base + rand_ini

    # within-frame ramp: the reference cumsum is inclusive, so sample s of a
    # frame sits at (s+1) increments past the frame base
    ramp = jnp.arange(1, hop + 1, dtype=jnp.float32)  # [hop]
    # phase[B, T, hop, dim] = frame_base + ramp * f/sr
    phase = frame_base[:, :, None, :] + ramp[None, None, :, None] * (
        f_h[:, :, None, :] / sampling_rate
    )
    sines = jnp.sin(2.0 * jnp.pi * phase).reshape(B, T * hop, dim) * sine_amp

    # U/V gating at sample rate (f0 is constant within a frame)
    uv = (f0_frames > voiced_threshold).astype(jnp.float32)
    uv = jnp.repeat(uv, hop, axis=1)[..., None]  # [B, T*hop, 1]

    if rng is not None:
        noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
        noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
    else:
        noise = 0.0
    out = sines * uv + noise
    if return_phase:
        return out, phase_end
    return out


def source_hn_nsf(
    f0_frames: jax.Array,
    hop: int,
    sampling_rate: int,
    rng: jax.Array | None = None,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    phase0: jax.Array | None = None,
    return_phase: bool = False,
):
    """[B, T_frames] -> [B, T_frames*hop, 1] merged harmonic excitation.

    SourceModuleHnNSF.forward (nsf.py:383-394): fixed 11->1 linear + tanh.
    phase0/return_phase enable streaming (see sine_harmonics).
    """
    sines = sine_harmonics(
        f0_frames, hop, sampling_rate, 10, sine_amp, noise_std,
        voiced_threshold, rng, phase0=phase0, return_phase=return_phase,
    )
    if return_phase:
        sines, phase_end = sines
    merged = sines @ jnp.asarray(MERGE_W)[:, None] + MERGE_B
    out = jnp.tanh(merged)
    if return_phase:
        return out, phase_end
    return out
