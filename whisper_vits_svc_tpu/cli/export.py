"""svc_export CLI — strip a trainer checkpoint to inference-only
(reference svc_export.py:48-57)."""

from __future__ import annotations

import argparse

from ..train import checkpoint as ckpt


def main(argv=None):
    p = argparse.ArgumentParser(prog="svc_export")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default="sovits5.0_export.ckpt")
    p.add_argument("--stablehlo", default=None, metavar="PATH",
                   help="also export a self-contained jax.export serving "
                        "artifact (weights baked in; see infer/serving.py)")
    p.add_argument("--config", default=None,
                   help="yaml config (required with --stablehlo)")
    p.add_argument("--chunk-frames", type=int, default=2520,
                   help="static chunk geometry of the serving artifact")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu,cpu (default: current backend)")
    p.add_argument("--bf16", action="store_true",
                   help="bake bf16 weights/compute into the serving artifact")
    args = p.parse_args(argv)
    if args.stablehlo and not args.config:
        p.error("--stablehlo requires --config")

    payload = (
        ckpt.load_torch_pretrain(args.checkpoint)
        if args.checkpoint.endswith((".pth", ".pt"))
        else ckpt.load(args.checkpoint)
    )
    ckpt.export_inference(args.out, payload["model_g"])
    print(f"exported inference checkpoint -> {args.out}")

    if args.stablehlo:
        import jax.numpy as jnp

        from ..infer import pipeline, serving
        from ..utils.config import load_config

        hp = load_config(args.config)
        model = pipeline.build_infer_model(hp)
        params = pipeline.load_svc_model(args.out, model, hp)
        n = serving.export_synthesis(
            params, hp, args.stablehlo, chunk_frames=args.chunk_frames,
            platforms=(tuple(args.platforms.split(","))
                       if args.platforms else None),
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
        )
        print(f"exported serving artifact -> {args.stablehlo} ({n} bytes)")


if __name__ == "__main__":
    main()
