"""svc_inference CLI — mirrors reference svc_inference.py:206-241.

Auto-extracts missing features (in-process, no subprocess hops: the reference
os.system's three python scripts, svc_inference.py:142-154), then runs chunked
synthesis and writes svc_out.wav (+ svc_out_pit.wav excitation debug render).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..infer import pipeline
from ..infer.retrieval import DummyRetrieval, create_retrieval
from ..utils.audio_io import load_wav, save_wav
from ..utils.config import load_config


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="svc_inference")
    p.add_argument("--config", required=True, help="yaml config")
    p.add_argument("--model", required=True, help="model checkpoint")
    p.add_argument("--wave", required=True, help="input 16k/any wav")
    p.add_argument("--spk", required=True, help="speaker embedding npy")
    p.add_argument("--ppg", default=None, help="ppg npy (auto if absent)")
    p.add_argument("--vec", default=None, help="hubert vec npy (auto)")
    p.add_argument("--pit", default=None, help="pitch csv (auto)")
    p.add_argument("--shift", type=int, default=0, help="semitones")
    p.add_argument("--enable-retrieval", action="store_true")
    p.add_argument("--retrieval-index-prefix", default="")
    p.add_argument("--retrieval-ratio", type=float, default=0.5)
    p.add_argument("--n-retrieval-vectors", type=int, default=3)
    p.add_argument("--whisper-ckpt", default="whisper_pretrain/large-v2.pt")
    p.add_argument("--hubert-ckpt", default="hubert_pretrain/hubert-soft-0d54a1f4.pt")
    p.add_argument("--crepe-ckpt", default="crepe/assets/full.pth")
    p.add_argument("--f0-engine", default="crepe",
                   choices=["crepe", "salience", "swipe", "yin", "pyin",
                            "dio", "praat"],
                   help="pitch extractor for the auto --pit path (the reference"
                        " exposes these as compute_f0_* in pitch/inference.py)")
    p.add_argument("--out", default="svc_out.wav")
    p.add_argument("--bf16", action="store_true",
                   help="run the synthesis graph in bfloat16 on the MXU")
    p.add_argument("--chunk-batch", type=int, default=1,
                   help="synthesize this many 25 s chunks per device call "
                        "(batched on the MXU; same noise stream as "
                        "sequential)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard the chunk batch across this many devices "
                        "(data-parallel long-audio synthesis)")
    return p


def auto_extract(args) -> None:
    audio16, _ = load_wav(args.wave, target_sr=16000)
    if args.ppg is None:
        args.ppg = "svc_tmp.ppg.npy"
        if not os.path.isfile(args.ppg):
            from ..models.whisper import load_whisper_encoder, pred_ppg

            import jax

            print(f"Auto run : whisper ppg -> {args.ppg}")
            m, p = load_whisper_encoder(args.whisper_ckpt)
            np.save(args.ppg, pred_ppg(m, p, audio16, rng=jax.random.PRNGKey(0)),
                    allow_pickle=False)
    if args.vec is None:
        args.vec = "svc_tmp.vec.npy"
        if not os.path.isfile(args.vec):
            from ..models.hubert import load_hubert_soft, pred_vec

            print(f"Auto run : hubert vec -> {args.vec}")
            m, p = load_hubert_soft(args.hubert_ckpt)
            np.save(args.vec, pred_vec(m, p, audio16), allow_pickle=False)
    if args.pit is None:
        args.pit = "svc_tmp.pit.csv"
        if not os.path.isfile(args.pit):
            engine = getattr(args, "f0_engine", "crepe")
            print(f"Auto run : {engine} pitch -> {args.pit}")
            if engine == "crepe":
                from ..models.crepe import compute_f0_sing, load_crepe

                m, p = load_crepe(args.crepe_ckpt)
                pit = compute_f0_sing(m, p, audio16, np.random.default_rng(0))
            elif engine == "salience":
                from ..models.salience import compute_f0_sing_salience

                pit = compute_f0_sing_salience(audio16)
            elif engine == "dio":
                from ..models.dio import compute_f0_dio

                pit = compute_f0_dio(audio16, 16000, hop=160)
            elif engine == "praat":
                from ..models.praat import compute_f0_mouth

                pit = compute_f0_mouth(audio16, 16000, hop=160)
            elif engine == "swipe":
                from ..models.swipe import swipe

                pit, _ = swipe(audio16, 16000, hop=160)
            elif engine == "yin":
                from ..models.f0_alt import yin

                pit, _ = yin(audio16, fs=16000, hop=160)
            else:  # pyin
                from ..models.f0_alt import pyin

                pit, _ = pyin(audio16, fs=16000, hop=160)
            pipeline.save_csv_pitch(pit, args.pit)


def main(argv=None):
    main_from_namespace(build_argparser().parse_args(argv))


def main_from_namespace(args):
    hp = load_config(args.config)
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    auto_extract(args)

    # mesh-sharded synthesis keeps the Pallas kernels: svc_infer wraps the
    # per-chunk body in shard_map, so each chip runs the single-chunk program
    model = pipeline.build_infer_model(hp)
    params = pipeline.load_svc_model(args.model, model, hp)
    retrieval = (
        create_retrieval(
            True, args.retrieval_ratio, args.n_retrieval_vectors,
            args.retrieval_index_prefix + "whisper.npz",
            args.retrieval_index_prefix + "hubert.npz",
        )
        if args.enable_retrieval
        else DummyRetrieval()
    )

    spk = np.load(args.spk)
    ppg = np.repeat(np.load(args.ppg), 2, 0)  # 320 -> 160-hop x2
    vec = np.repeat(np.load(args.vec), 2, 0)
    pit = pipeline.load_csv_pitch(args.pit)
    print("pitch shift: ", args.shift)
    pit = pipeline.shift_pitch(pit, args.shift)

    compute_dtype = None
    if getattr(args, "bf16", False):
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    mesh = None
    if getattr(args, "mesh_data", 0):
        import jax

        from ..parallel import mesh as pmesh

        mesh = pmesh.create_mesh(devices=jax.devices()[: args.mesh_data])
    audio, source = pipeline.svc_infer(
        model, params, retrieval, spk, pit, ppg, vec, hp, return_source=True,
        compute_dtype=compute_dtype,
        chunk_batch=getattr(args, "chunk_batch", 1), mesh=mesh,
    )
    save_wav("svc_out_pit.wav", source, hp.data.sampling_rate)
    save_wav(args.out, audio, hp.data.sampling_rate)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
