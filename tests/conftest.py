"""Test configuration: force an 8-device virtual CPU mesh.

This is the idiomatic JAX answer to testing multi-chip sharding without
hardware (SURVEY.md §4c): XLA's host platform is split into 8 virtual
devices, so pjit/shard_map paths execute real collectives locally.
Must run before jax is imported anywhere.
"""

import os

# Hard-set (the environment pre-sets JAX_PLATFORMS for the TPU tunnel; tests
# must run on the virtual CPU mesh regardless).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy compile / long-running tests excluded from the fast tier "
        "(run `pytest -m 'not slow'` for the <2 min per-module sweep)",
    )
    # Persistent XLA compile cache: the tier's wall time is compile-dominated
    # on CPU, and the cache is keyed by HLO so stale hits are impossible —
    # re-runs skip every unchanged compile. SVC_TEST_CACHE overrides the
    # location ("" disables) e.g. for a deliberately-cold timing run.
    # 0.5 s threshold: eager flax applies in the parity tests dispatch many
    # sub-2s compiles that add up to tens of seconds per run.
    from whisper_vits_svc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(
        os.environ.get(
            "SVC_TEST_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".xla_cache")),
        min_secs=0.5,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def micro_train():
    """Session-shared micro-config GAN stepper: ONE init + ONE compiled step
    reused by every fast-tier train test (states are immutable pytrees, so
    sharing is safe). Batch is always 8 / sharded over the full mesh +
    replicated states — the realistic SPMD layout."""
    from whisper_vits_svc_tpu.parallel import mesh as pmesh
    from whisper_vits_svc_tpu.train.step import init_train_states, make_train_step
    from whisper_vits_svc_tpu.utils.testing import micro_hp, synthetic_batch

    hp = micro_hp(batch_size=8)
    g_state, d_state, g_model, d_model = init_train_states(hp, jax.random.PRNGKey(0))
    mesh = pmesh.create_mesh()
    step = jax.jit(make_train_step(hp, g_model, d_model))

    def batch_fn(rng=None, b=8, t=20):
        rng = rng or np.random.default_rng(0)
        return pmesh.shard_batch(synthetic_batch(hp, rng, b=b, t=t), mesh)

    return dict(
        hp=hp, mesh=mesh, step=step, batch_fn=batch_fn,
        g_state=pmesh.replicate(g_state, mesh),
        d_state=pmesh.replicate(d_state, mesh),
        g_model=g_model, d_model=d_model,
        g_state_host=g_state, d_state_host=d_state,
    )
