"""svc_trainer CLI — mirrors reference svc_trainer.py:13-43 (single SPMD
process replaces mp.spawn; the device mesh handles multi-chip)."""

from __future__ import annotations

import argparse

import numpy as np

from ..train.loop import train
from ..utils.config import load_config


def main(argv=None):
    p = argparse.ArgumentParser(prog="svc_trainer")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-n", "--name", required=True)
    p.add_argument("-p", "--checkpoint_path", default=None)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--profile-dir", default=None,
                   help="capture an xprof trace of steps 3..12 to this dir")
    args = p.parse_args(argv)

    hp = load_config(args.config)
    assert hp.data.hop_length == 320, "hop_length must be 320 (reference svc_trainer.py:27)"
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    np.random.seed(hp.train.seed)
    train(hp, args.name, args.checkpoint_path, args.max_epochs, args.max_steps,
          profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
