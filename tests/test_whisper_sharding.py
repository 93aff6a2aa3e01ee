"""Tensor-parallel Whisper encoder: sharded == unsharded, on the virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from whisper_vits_svc_tpu.models.whisper import WhisperEncoder
from whisper_vits_svc_tpu.parallel import mesh as pmesh
from whisper_vits_svc_tpu.parallel.sharding import (
    shard_whisper_params, sharded_ppg_fn, whisper_param_spec,
)


def test_whisper_tensor_parallel_matches_single(rng):
    model = WhisperEncoder(n_mels=8, n_ctx=32, n_state=64, n_head=4, n_layer=2)
    mel = jnp.asarray(rng.standard_normal((4, 64, 8)), jnp.float32) * 0.3
    params = model.init(jax.random.PRNGKey(0), mel)["params"]
    ref = np.asarray(model.apply({"params": params}, mel))

    # 2-way data x 4-way model over the 8 virtual devices
    mesh = pmesh.create_mesh(num_data=2, num_model=4)
    sharded = shard_whisper_params(params, mesh)

    # q/k/v kernels actually got column-sharded
    qk = sharded["blocks_0"]["attn"]["query"]["kernel"]
    assert not qk.sharding.is_fully_replicated
    ln = sharded["blocks_0"]["attn_ln"]["scale"]
    assert ln.sharding.is_fully_replicated

    run = sharded_ppg_fn(model, mesh)
    out = np.asarray(run(sharded, mel))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_param_spec_rules():
    assert whisper_param_spec(("blocks_0", "attn", "query", "kernel")) == P(None, "model")
    assert whisper_param_spec(("blocks_0", "attn", "out", "kernel")) == P("model", None)
    assert whisper_param_spec(("blocks_3", "mlp_0", "bias")) == P("model")
    assert whisper_param_spec(("blocks_3", "mlp_2", "kernel")) == P("model", None)
    assert whisper_param_spec(("conv1", "kernel")) == P()
    assert whisper_param_spec(("ln_post", "scale")) == P()
