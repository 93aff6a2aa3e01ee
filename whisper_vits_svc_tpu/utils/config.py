"""Config tree: a tiny YAML-backed dot-access config.

Replaces the reference's OmegaConf usage (reference: svc_trainer.py:23,
svc_inference.py:162) without eval'd strings (the reference eval's
`mrd.resolutions`, configs/base.yaml:55 — here resolutions are a plain list).

The raw YAML string is kept on the config (`.raw`) and stored in checkpoints
for drift detection, mirroring reference vits_extend/train.py:131-133.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Mapping

import yaml


class Config(dict):
    """Nested dict with attribute access. Immutable-ish by convention."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        super().__setitem__(name, Config._wrap(value))

    @staticmethod
    def _wrap(obj: Any) -> Any:
        if isinstance(obj, Mapping):
            return Config({k: Config._wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config._wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, Config):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)

    def copy(self) -> "Config":
        return Config._wrap(copy.deepcopy(self.to_dict()))


def load_config(path: str) -> Config:
    with open(path, "r") as f:
        raw = f.read()
    cfg = Config._wrap(yaml.safe_load(io.StringIO(raw)))
    cfg["raw"] = raw
    return cfg


def config_from_dict(d: Mapping) -> Config:
    return Config._wrap(dict(d))


def dump_config(cfg: Config) -> str:
    d = cfg.to_dict()
    d.pop("raw", None)
    return yaml.safe_dump(d, sort_keys=False)


def edit_config_file(src: str, dst: str, updates: Mapping[str, Mapping[str, Any]]) -> str:
    """Round-trip YAML edit: rewrite `section.key: value` scalars in-place
    while preserving every comment, blank line, quote and the key order —
    the reference does this with ruamel for the WebUI's train.yaml
    (/root/reference/app.py:169-180); this is a dependency-free equivalent
    for the repo's 2-level config layout.

    updates: {"train": {"learning_rate": 1e-4, ...}, "log": {...}}.
    Returns the rewritten text (also written to dst). Raises KeyError if a
    requested key is not found in its section.
    """
    with open(src, "r") as f:
        lines = f.read().split("\n")

    pending = {s: dict(kv) for s, kv in updates.items() if kv}
    section = None
    for i, line in enumerate(lines):
        stripped = line.split("#", 1)[0].rstrip()
        if stripped and not line[:1].isspace() and stripped.endswith(":"):
            section = stripped[:-1]
            continue
        if section in pending and line[:1].isspace() and ":" in stripped:
            key = stripped.split(":", 1)[0].strip()
            if key in pending[section]:
                value = pending[section].pop(key)
                if isinstance(value, str):
                    value_s = f'"{value}"'
                elif isinstance(value, bool):
                    value_s = "true" if value else "false"
                else:
                    value_s = repr(value)
                indent = line[: len(line) - len(line.lstrip())]
                comment = ""
                if "#" in line:
                    comment = "  #" + line.split("#", 1)[1]
                lines[i] = f"{indent}{key}: {value_s}{comment}"
                if not pending[section]:
                    del pending[section]

    leftover = {s: list(kv) for s, kv in pending.items()}
    if leftover:
        raise KeyError(f"keys not found in {src}: {leftover}")
    text = "\n".join(lines)
    with open(dst, "w") as f:
        f.write(text)
    return text
