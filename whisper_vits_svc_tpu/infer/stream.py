"""Streaming (block-wise, low-latency) voice conversion.

The reference states real-time conversion is NOT supported (its whisper stage
is too slow, reference README.md:22) and only offers offline 25 s chunking.
At TPU throughput the bottleneck disappears, so this runtime adds what the
reference never could: a stateful block-wise converter.

Design:
  * features arrive at the 160-hop frame rate (from any extractor front-end);
    each `push()` takes a block of frames and returns the corresponding
    synthesized samples,
  * the prior encoder + flow see [left context | new block] and only the new
    block's samples are emitted (attention context comparable to offline
    chunking — same approximation the reference's chunk overlap makes),
  * the NSF excitation is generated per block with an explicit carried phase
    state, making the excitation bit-identical to whole-utterance generation
    — chunk seams stay phase-continuous (the streaming analog of
    svc_inference.py:90's whole-utterance source),
  * one compiled program (static [context + block] shape) regardless of
    stream length.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.synthesizer import SynthesizerInfer
from ..nn.nsf import source_hn_nsf


class StreamingSvc:
    def __init__(
        self,
        model: SynthesizerInfer,
        params,
        spk: np.ndarray,
        hp,
        block_frames: int = 100,       # 1 s at 100 fps
        context_frames: int = 50,      # 0.5 s left context
        noise_scale: float = 1.0,
        seed: int = 0,
    ):
        self.model = model
        self.params = params
        self.hp = hp
        self.hop = hp.data.hop_length
        self.block = block_frames
        self.context = context_frames
        self.noise_scale = noise_scale
        self.spk = jnp.asarray(spk, jnp.float32)[None, :]
        self.rng = jax.random.PRNGKey(seed)
        self._step = 0

        dim = 11  # fundamental + 10 harmonics
        self.phase = jnp.zeros((1, dim), jnp.float32)
        ppg_dim, vec_dim = hp.vits.ppg_dim, hp.vits.vec_dim
        self.ctx_ppg = np.zeros((context_frames, ppg_dim), np.float32)
        self.ctx_vec = np.zeros((context_frames, vec_dim), np.float32)
        self.ctx_pit = np.zeros((context_frames,), np.float32)
        self.ctx_valid = 0

        total = context_frames + block_frames

        @jax.jit
        def run(params, ppg, vec, pit, spk, length, phase, rng):
            # excitation only for the NEW block, continued from carried phase
            block_pit = pit[:, context_frames:]
            src_new, phase_out = source_hn_nsf(
                block_pit, self.hop, hp.data.sampling_rate, rng=None,
                phase0=phase, return_phase=True,
            )
            # context excitation regenerated from (phase - context increment);
            # cheaper: synthesize the full window source by rolling phase back
            ctx_pit = pit[:, :context_frames]
            inc = jnp.sum(
                ctx_pit[..., None] * jnp.arange(1, 12) * (self.hop / hp.data.sampling_rate),
                axis=1,
            )
            phase_ctx = phase - (inc - jnp.floor(inc))
            src_ctx = source_hn_nsf(
                ctx_pit, self.hop, hp.data.sampling_rate, rng=None,
                phase0=phase_ctx - jnp.floor(phase_ctx),
            )
            source = jnp.concatenate([src_ctx, src_new], axis=1)
            out = self.model.apply(
                {"params": params}, ppg, vec, pit, spk, length, source,
                noise_scale, rngs={"noise": rng},
            )
            return out[:, context_frames * self.hop :, 0], phase_out

        self._run = run
        self._total = total

    def attach_extractor(self, extractor) -> None:
        """Attach a stream_extract.StreamingExtractor for the audio-in API.

        The extractor's 16 kHz block (block_samples) must map to at most
        this converter's block_frames at 100 fps: block_samples//320*2
        <= block_frames."""
        assert extractor.block // 160 <= self.block, (
            "extractor block emits more frames than the synthesis block")
        self.extractor = extractor

    def push_audio(self, samples16k: np.ndarray) -> np.ndarray:
        """Audio-in streaming: 16 kHz source block -> 32 kHz converted audio.

        Composes the streaming extractors (whisper sliding window, carried-
        context hubert, fixed-lag crepe — infer/stream_extract.py) with the
        synthesis streaming; the emitted audio trails the input by the
        extractor's lag (default 80 ms) plus the block buffering itself.
        The full chain the reference rules out as 'too slow'
        (/root/reference/README.md:22), measured in tools/bench_stream.py."""
        ppg2, vec2, pit = self.extractor.push(samples16k)
        if len(pit) == 0:
            return np.zeros(0, np.float32)
        return self.push(ppg2, vec2, pit)

    def flush_audio(self) -> np.ndarray:
        """Drain the extractor lag tail at end of stream."""
        ppg2, vec2, pit = self.extractor.flush()
        if len(pit) == 0:
            return np.zeros(0, np.float32)
        return self.push(ppg2, vec2, pit)

    def push(self, ppg: np.ndarray, vec: np.ndarray, pit: np.ndarray) -> np.ndarray:
        """Feed `block_frames` of features; returns block_frames*hop samples.

        Short final blocks are zero-padded internally; the returned audio is
        truncated to the actual frame count.
        """
        n = ppg.shape[0]
        assert n <= self.block, f"push at most {self.block} frames"
        pad = self.block - n
        ppg_b = np.pad(ppg.astype(np.float32), ((0, pad), (0, 0)))
        vec_b = np.pad(vec.astype(np.float32), ((0, pad), (0, 0)))
        pit_b = np.pad(pit.astype(np.float32), (0, pad))

        full_ppg = np.concatenate([self.ctx_ppg, ppg_b])[None]
        full_vec = np.concatenate([self.ctx_vec, vec_b])[None]
        full_pit = np.concatenate([self.ctx_pit, pit_b])[None]
        length = np.asarray([self._total], np.int32)

        self.rng, sub = jax.random.split(self.rng)
        audio, self.phase = self._run(
            self.params, full_ppg, full_vec, full_pit, self.spk, length,
            self.phase, sub,
        )
        # roll feature context
        keep = np.concatenate([self.ctx_ppg, ppg_b])[-self.context :]
        self.ctx_ppg = keep
        self.ctx_vec = np.concatenate([self.ctx_vec, vec_b])[-self.context :]
        self.ctx_pit = np.concatenate([self.ctx_pit, pit_b])[-self.context :]
        self.ctx_valid = min(self.ctx_valid + n, self.context)
        self._step += 1
        return np.asarray(audio)[0, : n * self.hop]
