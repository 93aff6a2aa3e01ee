"""svc_preprocessing CLI — one in-process driver replaces the reference's 10
sequential subprocesses (svc_preprocessing.py:14-25). Stages are idempotent;
rerunning resumes where it stopped."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(prog="svc_preprocessing")
    p.add_argument("--dataset-raw", default="dataset_raw")
    p.add_argument("--out", default="data_svc")
    p.add_argument("--files", default="files")
    p.add_argument("-c", "--config", default="configs/base.yaml")
    p.add_argument("--whisper-ckpt", default="whisper_pretrain/large-v2.pt")
    p.add_argument("--hubert-ckpt", default="hubert_pretrain/hubert-soft-0d54a1f4.pt")
    p.add_argument("--crepe-ckpt", default="crepe_pretrain/full.pth")
    p.add_argument("--speaker-ckpt", default="speaker_pretrain/best_model.pth.tar")
    p.add_argument("--batch-windows", type=int, default=8,
                   help="extractor windows batched per device call "
                        "(packed across utterances)")
    p.add_argument("--io-threads", type=int, default=4)
    p.add_argument("--serial", action="store_true",
                   help="per-utterance serial loop (the round-3 baseline; "
                        "for A/B measurement only)")
    p.add_argument("--stage", choices=["all", "cdc", "trim"], default="all",
                   help="'cdc'/'trim' run only the VCTK cleanup stages "
                        "(reference prepare/preprocess_cdc.py / preprocess_trim.py) "
                        "from -i to -o")
    p.add_argument("-i", "--in-path", default=None, help="input dir for --stage cdc/trim")
    p.add_argument("-o", "--out-path", default=None, help="output dir for --stage cdc/trim")
    args = p.parse_args(argv)

    if args.stage in ("cdc", "trim"):
        if not args.in_path or not args.out_path:
            p.error(f"--stage {args.stage} requires -i and -o")
        from ..data.preprocess import cdc_directory, trim_directory

        fn = cdc_directory if args.stage == "cdc" else trim_directory
        n = fn(args.in_path, args.out_path)
        print(f"{args.stage}: {n} files")
        return

    from ..data.preprocess import Extractors, preprocess
    from ..utils.config import load_config

    hp = load_config(args.config)
    ex = Extractors()
    if os.path.isfile(args.crepe_ckpt):
        from ..models.crepe import load_crepe

        ex.crepe = load_crepe(args.crepe_ckpt)
    else:
        print(f"[skip] crepe checkpoint missing: {args.crepe_ckpt}")
    if os.path.isfile(args.whisper_ckpt):
        from ..models.whisper import load_whisper_encoder

        ex.whisper = load_whisper_encoder(args.whisper_ckpt)
    else:
        print(f"[skip] whisper checkpoint missing: {args.whisper_ckpt}")
    if os.path.isfile(args.hubert_ckpt):
        from ..models.hubert import load_hubert_soft

        ex.hubert = load_hubert_soft(args.hubert_ckpt)
    else:
        print(f"[skip] hubert checkpoint missing: {args.hubert_ckpt}")
    if os.path.isfile(args.speaker_ckpt):
        from ..models.speaker_encoder import load_speaker_encoder

        ex.speaker = load_speaker_encoder(args.speaker_ckpt)
    else:
        print(f"[skip] speaker checkpoint missing: {args.speaker_ckpt}")

    stats = preprocess(args.dataset_raw, args.out, args.files, hp.data, ex,
                       batch_windows=args.batch_windows,
                       io_threads=args.io_threads, serial=args.serial)
    print(stats)
    if stats.get("rows"):
        from ..data.preprocess import dataset_dry_run

        dataset_dry_run(hp.data, args.files, hp.train.get("batch_size", 2))


if __name__ == "__main__":
    main()
