"""Remaining CLI surface: shift / batch / post / merge / eva / retrieval.

Mirrors reference svc_inference_shift.py, svc_inference_batch.py,
svc_inference_post.py, svc_merge.py, svc_eva.py, svc_train_retrieval.py.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..utils.audio_io import load_wav, save_wav


def inference_shift_main(argv=None):
    """Loop pitch shift over [shift_l, shift_r] semitones
    (svc_inference_shift.py:61-102)."""
    from . import inference as inf

    p = inf.build_argparser()
    p.prog = "svc_inference_shift"
    p.add_argument("--shift_l", type=int, default=0)
    p.add_argument("--shift_r", type=int, default=0)
    args = p.parse_args(argv)
    assert args.shift_l >= -12 and args.shift_r <= 12 and args.shift_l <= args.shift_r

    from ..infer import pipeline
    from ..infer.retrieval import DummyRetrieval
    from ..utils.config import load_config

    hp = load_config(args.config)
    inf.auto_extract(args)
    model = pipeline.build_infer_model(hp)
    params = pipeline.load_svc_model(args.model, model, hp)
    spk = np.load(args.spk)
    ppg = np.repeat(np.load(args.ppg), 2, 0)
    vec = np.repeat(np.load(args.vec), 2, 0)
    pit0 = pipeline.load_csv_pitch(args.pit)
    for shift in range(args.shift_l, args.shift_r + 1):
        pit = pipeline.shift_pitch(pit0.copy(), shift)
        audio = pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit,
                                   ppg, vec, hp)
        save_wav(f"svc_out_{shift}.wav", audio, hp.data.sampling_rate)
        print(f"wrote svc_out_{shift}.wav")


def inference_batch_main(argv=None):
    """Folder batch conversion (svc_inference_batch.py:35-44), in-process."""
    from . import inference as inf

    p = argparse.ArgumentParser(prog="svc_inference_batch")
    p.add_argument("--config", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--folder", required=True)
    p.add_argument("--spk", required=True)
    p.add_argument("--shift", type=int, default=0)
    p.add_argument("--out", default="svc_out_batch")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    wavs = sorted(f for f in os.listdir(args.folder) if f.endswith(".wav"))
    for f in wavs:
        sub = argparse.Namespace(
            config=args.config, model=args.model,
            wave=os.path.join(args.folder, f), spk=args.spk,
            ppg=None, vec=None, pit=None, shift=args.shift,
            enable_retrieval=False, retrieval_index_prefix="",
            retrieval_ratio=0.5, n_retrieval_vectors=3,
            whisper_ckpt="whisper_pretrain/large-v2.pt",
            hubert_ckpt="hubert_pretrain/hubert-soft-0d54a1f4.pt",
            crepe_ckpt="crepe_pretrain/full.pth",
            out=os.path.join(args.out, f),
        )
        for tmp in ("svc_tmp.ppg.npy", "svc_tmp.vec.npy", "svc_tmp.pit.csv"):
            if os.path.isfile(tmp):
                os.remove(tmp)
        inf.main_from_namespace(sub)
        print(f"{f} -> {sub.out}")


def inference_post_main(argv=None):
    """VAD hard-mute post filter (svc_inference_post.py:31-51)."""
    from ..infer.post import apply_vad_mask

    p = argparse.ArgumentParser(prog="svc_inference_post")
    p.add_argument("--ref", required=True, help="original 16k input wav")
    p.add_argument("--svc", required=True, help="32k svc output wav")
    p.add_argument("--out", default="svc_out_post.wav")
    p.add_argument("--vad-model", default="vad/assets/silero_vad.jit",
                   help="silero jit weights (converted to JAX at load); "
                        "energy-VAD fallback if absent")
    args = p.parse_args(argv)

    vad_params = None
    if os.path.isfile(args.vad_model):
        from ..models.silero_vad import load_silero_vad

        vad_params = load_silero_vad(args.vad_model)

    ref, _ = load_wav(args.ref, target_sr=16000)
    svc, sr = load_wav(args.svc)
    out = apply_vad_mask(svc, ref, vad_params=vad_params)
    save_wav(args.out, out, sr)
    print(f"wrote {args.out}")


def merge_main(argv=None):
    from ..infer.tools import average_model, merge_model

    p = argparse.ArgumentParser(prog="svc_merge")
    p.add_argument("--model1", required=True)
    p.add_argument("--model2", default=None)
    p.add_argument("--models", nargs="*", default=None, help="N-way average")
    p.add_argument("--ratio", type=float, default=0.5)
    p.add_argument("--out", default="svc_merge.ckpt")
    args = p.parse_args(argv)
    if args.models:
        average_model([args.model1] + args.models, args.out)
    else:
        merge_model(args.model1, args.model2, args.out, args.ratio)
    print(f"wrote {args.out}")


def eva_main(argv=None):
    from ..infer.tools import mix_speakers

    p = argparse.ArgumentParser(prog="svc_eva")
    p.add_argument("--spk", nargs="+", required=True, help="singer npy paths")
    p.add_argument("--weights", nargs="+", type=float, required=True)
    p.add_argument("--out", default="eva.spk.npy")
    args = p.parse_args(argv)
    mix_speakers(args.spk, args.weights, args.out)
    print(f"wrote {args.out}")


def train_retrieval_main(argv=None):
    """Per-speaker retrieval banks (svc_train_retrieval.py)."""
    from ..infer.retrieval import build_index

    p = argparse.ArgumentParser(prog="svc_train_retrieval")
    p.add_argument("--base-dir", default="data_svc")
    p.add_argument("--out-dir", default="data_svc/indexes")
    p.add_argument("--compress-threshold", type=int, default=200_000)
    p.add_argument("--n-clusters", type=int, default=10_000)
    args = p.parse_args(argv)

    for feat, sub in [("whisper", "whisper"), ("hubert", "hubert")]:
        root = os.path.join(args.base_dir, sub)
        if not os.path.isdir(root):
            continue
        for spk in sorted(os.listdir(root)):
            files = sorted(
                os.path.join(root, spk, f)
                for f in os.listdir(os.path.join(root, spk))
                if f.endswith(".npy")
            )
            if not files:
                continue
            os.makedirs(os.path.join(args.out_dir, spk), exist_ok=True)
            out = os.path.join(args.out_dir, spk, f"{feat}.npz")
            bank = build_index(files, out, threshold=args.compress_threshold,
                               n_clusters=args.n_clusters)
            print(f"{spk}/{feat}: {bank.shape} -> {out}")
