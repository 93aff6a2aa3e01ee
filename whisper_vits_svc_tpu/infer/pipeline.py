"""Chunked SVC synthesis — the svc_infer runtime.

Reference svc_inference.py:77-134 semantics, XLA-shaped: the NSF harmonic
source is generated ONCE for the whole utterance and sliced per chunk so the
excitation phase is continuous across chunk boundaries (the trick that makes
chunking artifact-free, SURVEY.md §5.7); fixed-size chunks with a 10-frame
overlap trimmed at the seams. Every chunk is right-padded to the static
`out_chunk + 2*hop_frame` shape with a length mask, so the whole song runs
through exactly ONE compiled program regardless of its duration.

Default chunk size is 1000 frames (10 s) — a TPU sweet spot measured
through this very path (40.1 vs 45.2 us/frame against the reference's
2500-frame chunks, same-session device-trace sweep in
tools/diag_chunkgeom.py; XLA's conv fusions degrade superlinearly above
~1000 frames). The reference's 25 s figure was a GPU-memory-era choice
(svc_inference.py:96-98); chunk size changes no semantics — the overlap
trim and the shared whole-utterance excitation make any size seamless —
so pass out_chunk=2500 for the literal reference geometry.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.synthesizer import SynthesizerInfer
from ..parallel import mesh as pmesh
from ..train import checkpoint as ckpt
from ..utils.config import Config

MAX_WAV_VALUE = 32768.0


@partial(jax.jit, static_argnums=(1, 2))
def _source_program(f0, hop, sr):
    from ..nn.nsf import source_hn_nsf

    return source_hn_nsf(f0, hop, sr, rng=None)


def pitch2source_bucketed(model: SynthesizerInfer, pit: np.ndarray,
                          bucket_frames: int = 1000) -> np.ndarray:
    """Whole-utterance excitation through ONE jitted program per length
    bucket (the eager model.pitch2source dispatches per-op and would retrace
    per utterance length). Zero-padding the f0 tail is exact for the real
    prefix: the phase cumsum is a prefix scan and f0=0 frames emit nothing
    under rng=None."""
    t = len(pit)
    tp = max(bucket_frames, -(-t // bucket_frames) * bucket_frames)
    f0 = np.zeros((1, tp), np.float32)
    f0[0, :t] = pit
    hop = int(math.prod(model.upsample_rates))
    src = _source_program(jnp.asarray(f0), hop, model.sampling_rate)
    return np.asarray(src)[:, : t * hop]


@partial(jax.jit, static_argnums=(0, 1))
def _chunk_program(model: SynthesizerInfer, noise_scale, params, ppg_c, vec_c,
                   pit_c, spk_c, lengths, source_c, rngs):
    """[N, ...] stacked chunks -> [N, chunk_max*hop, 1] waveforms. Module-
    level jit (model static): repeated svc_infer calls — chunk batches,
    serving loops, benches — reuse one compiled program instead of
    re-tracing through a per-call closure."""
    dt = jax.tree.leaves(params)[0].dtype

    def one(ppg_1, vec_1, pit_1, length_1, source_1, rng):
        out = model.apply(
            {"params": params},
            ppg_1[None].astype(dt), vec_1[None].astype(dt), pit_1[None],
            spk_c.astype(dt), length_1[None], source_1[None].astype(dt),
            noise_scale, rngs={"noise": rng},
        )
        return out[0].astype(jnp.float32)

    return jax.vmap(one)(ppg_c, vec_c, pit_c, lengths, source_c, rngs)


@lru_cache(maxsize=8)
def _mesh_chunk_program(model: SynthesizerInfer, noise_scale, mesh):
    """shard_map variant of _chunk_program over the mesh's data axis (cached
    per (model, noise_scale, mesh))."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    import inspect

    from jax.sharding import PartitionSpec as P

    def body(params, ppg_c, vec_c, pit_c, spk_c, lengths, source_c, rngs):
        dt = jax.tree.leaves(params)[0].dtype

        def one(ppg_1, vec_1, pit_1, length_1, source_1, rng):
            out = model.apply(
                {"params": params},
                ppg_1[None].astype(dt), vec_1[None].astype(dt), pit_1[None],
                spk_c.astype(dt), length_1[None], source_1[None].astype(dt),
                noise_scale, rngs={"noise": rng},
            )
            return out[0].astype(jnp.float32)

        return jax.vmap(one)(ppg_c, vec_c, pit_c, lengths, source_c, rngs)

    # shard_map (not sharded-jit) so the per-device body is a plain
    # single-chunk program: Pallas kernels (ops/pallas_snake.py) run as-is
    # on each chip's local chunk instead of forcing the jnp fallback
    # (pallas_call does not auto-partition under pjit — VERDICT r1 weak #4).
    # Replication checking off: pallas_call has no replication rule; the
    # kwarg is check_vma on jax>=0.9, check_rep before.
    rep, dat = P(), P(pmesh.DATA_AXIS)
    _ckw = ("check_vma" if "check_vma"
            in inspect.signature(shard_map).parameters else "check_rep")
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(rep, dat, dat, dat, rep, dat, dat, dat),
        out_specs=dat, **{_ckw: False},
    ))


def build_infer_model(hp: Config, fast_edges: bool = False,
                      pallas_snake: bool | None = None) -> SynthesizerInfer:
    """fast_edges trades the outermost ~6 samples of each chunk (trimmed by
    the overlap anyway) for skipping 91 materialized edge-pads per chunk.
    Off by default: device traces showed XLA lowers the conv-internal zero
    padding to selects that cost more than the pads they replace.

    pallas_snake=None auto-enables the single-pass Pallas SnakeAlias kernel
    on TPU backends (ops/pallas_snake.py); pass False to force the jnp path.
    Mesh-sharded synthesis keeps the kernel — svc_infer wraps the per-chunk
    body in shard_map, so each chip runs the unpartitioned single-chunk
    program."""
    if pallas_snake is None:
        import jax

        pallas_snake = jax.default_backend() == "tpu"
    return SynthesizerInfer(
        spec_channels=hp.data.filter_length // 2 + 1,
        ppg_dim=hp.vits.ppg_dim,
        vec_dim=hp.vits.vec_dim,
        spk_dim=hp.vits.spk_dim,
        inter_channels=hp.vits.inter_channels,
        hidden_channels=hp.vits.hidden_channels,
        filter_channels=hp.vits.filter_channels,
        upsample_rates=tuple(hp.gen.upsample_rates),
        upsample_kernel_sizes=tuple(hp.gen.upsample_kernel_sizes),
        upsample_initial_channel=hp.gen.upsample_initial_channel,
        resblock_kernel_sizes=tuple(hp.gen.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(d) for d in hp.gen.resblock_dilation_sizes),
        sampling_rate=hp.data.sampling_rate,
        snake_exact_edges=not fast_edges,
        pallas_snake=pallas_snake and not fast_edges,
        enc_p_layers=hp.vits.get("enc_p_layers", 6),
        flow_wn_layers=hp.vits.get("flow_wn_layers", 4),
        n_flows=hp.vits.get("n_flows", 4),
    )


def load_svc_model(path: str, model: SynthesizerInfer, hp: Config):
    """Key-tolerant load from ours (.ckpt) or reference (.pth) checkpoints
    (reference svc_inference.py:61-74)."""
    import jax

    dummy_t = 8
    # jit: flax init is eager per-op dispatch otherwise (slow on CPU)
    init = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, dummy_t, hp.vits.ppg_dim)),
        jnp.zeros((1, dummy_t, hp.vits.vec_dim)),
        jnp.full((1, dummy_t), 200.0),
        jnp.zeros((1, hp.vits.spk_dim)),
        jnp.full((1,), dummy_t, jnp.int32),
        jnp.zeros((1, dummy_t * hp.data.hop_length, 1)),
    )["params"]
    if path.endswith((".pth", ".pt")):
        import torch

        from ..models import convert

        sd = torch.load(path, map_location="cpu", weights_only=False)["model_g"]
        saved = convert.synthesizer_infer(sd)
        return convert.merge_into(init, saved)
    payload = ckpt.load(path)
    return ckpt.merge_tolerant(init, payload["model_g"])


def shift_pitch(pit: np.ndarray, semitones: float) -> np.ndarray:
    """2^(s/12) scaling with source statistics print (svc_inference.py:187-199)."""
    if semitones == 0:
        return pit
    voiced = pit[pit > 0]
    if len(voiced):
        print(
            f"source pitch statics: mean={voiced.mean():0.1f}, "
            f"min={voiced.min():0.1f}, max={voiced.max():0.1f}"
        )
    return pit * 2 ** (semitones / 12)


def _chunk_plan(len_min: int, out_chunk: int, hop_frame: int):
    """The reference's chunk walk (svc_inference.py:101-131) as a static plan:
    per chunk (cut_s, cut_e) frame window plus the output trim slice."""
    plan = []
    out_index = 0
    while out_index < len_min:
        if out_index == 0:
            cut_s, cut_s_out = 0, 0
        else:
            cut_s, cut_s_out = out_index - hop_frame, hop_frame
        if out_index + out_chunk + hop_frame > len_min:
            cut_e, cut_e_out = len_min, None
        else:
            cut_e, cut_e_out = out_index + out_chunk + hop_frame, -hop_frame
        plan.append((cut_s, cut_e, cut_s_out, cut_e_out))
        out_index += out_chunk
    return plan


def svc_infer(
    model: SynthesizerInfer,
    params,
    retrieval,
    spk: np.ndarray,
    pit: np.ndarray,
    ppg: np.ndarray,
    vec: np.ndarray,
    hp: Config,
    noise_scale: float = 1.0,
    seed: int = 0,
    out_chunk: int = 1000,
    hop_frame: int = 10,
    return_source: bool = False,
    compute_dtype=None,
    chunk_batch: int = 1,
    mesh=None,
):
    """-> float32 waveform [S] (and optionally the excitation waveform).

    compute_dtype=jnp.bfloat16 runs the synthesis graph in bf16 on the MXU
    (params + activations cast; excitation synthesis and output stay f32).

    chunk_batch > 1 synthesizes that many 25 s chunks per device call, stacked
    on a batch axis (vmap over per-chunk rngs — same noise stream as the
    sequential walk). With `mesh`, the chunk batch is sharded across the
    mesh's data axis — the long-audio scaling story (SURVEY.md §5.7): chunks
    are independent given the shared whole-utterance excitation, so an
    n-chip mesh converts n chunks concurrently. chunk_batch defaults to the
    data-axis size when a mesh is given.
    """
    hop_size = hp.data.hop_length
    if compute_dtype is not None:
        params = jax.tree.map(lambda x: jnp.asarray(x, compute_dtype), params)
    len_min = min(len(pit), len(vec), len(ppg))
    pit = np.asarray(pit, np.float32)[:len_min]
    vec = np.asarray(vec, np.float32)[:len_min]
    ppg = np.asarray(ppg, np.float32)[:len_min]
    spk = np.asarray(spk, np.float32)[None, :]

    source = pitch2source_bucketed(model, pit)  # [1, S, 1], whole utterance

    chunk_max = out_chunk + 2 * hop_frame
    if mesh is not None and chunk_batch == 1:
        chunk_batch = int(mesh.shape[pmesh.DATA_AXIS])

    if mesh is not None:
        run_chunks = _mesh_chunk_program(model, noise_scale, mesh)
    else:
        run_chunks = partial(_chunk_program, model, noise_scale)

    plan = _chunk_plan(len_min, out_chunk, hop_frame)
    base_key = jax.random.PRNGKey(seed)
    trimmed: list[np.ndarray | None] = [None] * len(plan)
    for g0 in range(0, len(plan), chunk_batch):
        group = plan[g0 : g0 + chunk_batch]
        # pad the trailing group to the static batch shape (one compiled
        # program per chunk_batch; required for even data-axis sharding)
        n_pad = chunk_batch - len(group)
        ppg_c, vec_c, pit_c, src_c, lens, keys = [], [], [], [], [], []
        for gi, (cut_s, cut_e, _, _) in enumerate(group + group[-1:] * n_pad):
            t = cut_e - cut_s
            pad = chunk_max - t
            ppg_c.append(np.pad(retrieval.retriv_whisper(ppg[cut_s:cut_e]),
                                ((0, pad), (0, 0))))
            vec_c.append(np.pad(retrieval.retriv_hubert(vec[cut_s:cut_e]),
                                ((0, pad), (0, 0))))
            pit_c.append(np.pad(pit[cut_s:cut_e], (0, pad)))
            src_c.append(np.pad(source[0, cut_s * hop_size : cut_e * hop_size],
                                ((0, pad * hop_size), (0, 0))))
            lens.append(t)
            keys.append(jax.random.fold_in(base_key, g0 + gi))
        outs = run_chunks(
            params, np.stack(ppg_c), np.stack(vec_c), np.stack(pit_c), spk,
            np.asarray(lens, np.int32), np.stack(src_c), jnp.stack(keys),
        )
        outs = np.asarray(outs)
        for gi, (cut_s, cut_e, s_out, e_out) in enumerate(group):
            chunk_wav = outs[gi, : (cut_e - cut_s) * hop_size, 0]
            trimmed[g0 + gi] = chunk_wav[
                s_out * hop_size : None if e_out is None else e_out * hop_size
            ]

    audio = (
        np.concatenate(trimmed) if trimmed else np.zeros(0, np.float32)
    )
    if return_source:
        return audio, source[0, :, 0]
    return audio


def source2wav(source: np.ndarray) -> np.ndarray:
    """Excitation -> int16 debug waveform (generator.py:167-173)."""
    audio = np.squeeze(source) * MAX_WAV_VALUE
    return np.clip(audio, -MAX_WAV_VALUE, MAX_WAV_VALUE - 1).astype(np.int16)


def save_csv_pitch(pitch: np.ndarray, path: str):
    """Human-editable F0 CSV "Xm Ys Zms,f0" (pitch/inference.py:102-111)."""
    with open(path, "w", encoding="utf-8") as f:
        for i, p in enumerate(pitch):
            t = i * 10
            minute = t // 60000
            seconds = (t - minute * 60000) // 1000
            millisecond = t % 1000
            print(f"{minute}m {seconds}s {millisecond:3d},{int(p)}", file=f)


def load_csv_pitch(path: str) -> np.ndarray:
    """Reads the CSV back (integer Hz, pitch/inference.py:113-119)."""
    pitch = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                pitch.append(int(line.strip().split(",")[-1]))
    return np.asarray(pitch, np.float32)
