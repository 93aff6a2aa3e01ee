"""Persistent XLA compilation cache for the CLI entry points.

First compiles of the base-config train step / inference graph cost minutes
(CPU) to ~30 s (TPU); the cache is keyed by the HLO program + compile
options, so stale hits are impossible and re-runs of the same config skip
every unchanged compile. Enabled by the CLIs (trainer/inference/webui);
opt out with SVC_XLA_CACHE="" or point it elsewhere with
SVC_XLA_CACHE=/path.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None,
                         min_secs: float = 2.0) -> str | None:
    """Configure jax's persistent compilation cache. Returns the dir used
    (None when disabled). Safe to call multiple times / before backend init.

    Default dir is SVC_XLA_CACHE or ~/.cache/whisper_vits_svc_tpu/xla;
    pass `path` to pin a specific location (the test conftest and the
    multichip dryrun use repo-local .xla_cache). Empty -> disabled."""
    if path is None:
        path = os.environ.get(
            "SVC_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "whisper_vits_svc_tpu", "xla"),
        )
    if not path:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    return path
