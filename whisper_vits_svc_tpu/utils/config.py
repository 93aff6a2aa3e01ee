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
