"""Tensor-parallel sharding rules for the Whisper content encoder.

Whisper-large-v2's kept encoder (24 layers, 1280-d, ~640M params) is the one
model in the pipeline big enough to shard (BASELINE.json north star: "Whisper
encoder sharded across chips where it exceeds one chip's HBM"). Megatron-style
layout over the `model` mesh axis:

  * attention q/k/v and mlp_0 kernels column-sharded (head/hidden dim),
  * attention out and mlp_2 kernels row-sharded,
  * per-shard biases follow their kernel's output dim,
  * convs, layernorms, and activations replicated.

With params placed under these NamedShardings and the mel batch sharded on
`data`, XLA inserts exactly one all-reduce per attention block and one per MLP
(the standard 2-collective Megatron pattern) over ICI — no hand-written
collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def whisper_param_spec(path: tuple[str, ...]) -> P:
    """Param tree path -> PartitionSpec for WhisperEncoder params."""
    names = [p for p in path]
    if "attn" in names:
        leaf = names[-1]
        which = names[-2]
        if which in ("query", "key", "value"):
            return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
        if which == "out":
            return P(MODEL_AXIS, None) if leaf == "kernel" else P()
    if "mlp_0" in names:
        return P(None, MODEL_AXIS) if names[-1] == "kernel" else P(MODEL_AXIS)
    if "mlp_2" in names:
        return P(MODEL_AXIS, None) if names[-1] == "kernel" else P()
    return P()


def shard_whisper_params(params, mesh: Mesh):
    """Device-put the WhisperEncoder params with tensor-parallel shardings."""

    def place(path, leaf):
        spec = whisper_param_spec(tuple(k.key for k in path))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def sharded_ppg_fn(model, mesh: Mesh):
    """Returns a jitted mel->PPG function running tensor-parallel over `mesh`.

    The mel batch is sharded over `data`, params over `model`; a (data, model)
    mesh gives combined data+tensor parallelism for bulk PPG extraction.
    """
    from .mesh import DATA_AXIS

    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    out_sharding = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def run(params, mel):
        mel = jax.lax.with_sharding_constraint(mel, data_sharding)
        out = model.apply({"params": params}, mel)
        return jax.lax.with_sharding_constraint(out, out_sharding)

    return run
