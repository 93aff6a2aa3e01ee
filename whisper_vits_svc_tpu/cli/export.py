"""svc_export CLI — strip a trainer checkpoint to inference-only
(reference svc_export.py:48-57)."""

from __future__ import annotations

import argparse

from ..train import checkpoint as ckpt


def main(argv=None):
    p = argparse.ArgumentParser(prog="svc_export")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default="sovits5.0_export.ckpt")
    args = p.parse_args(argv)

    payload = (
        ckpt.load_torch_pretrain(args.checkpoint)
        if args.checkpoint.endswith((".pth", ".pt"))
        else ckpt.load(args.checkpoint)
    )
    ckpt.export_inference(args.out, payload["model_g"])
    print(f"exported inference checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
