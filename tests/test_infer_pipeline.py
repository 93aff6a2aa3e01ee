"""Inference-runtime tests: chunk continuity, retrieval blending, CSV pitch,
VAD post filter, merge/eva tools, preprocessing driver."""

import os

import numpy as np
import pytest

import jax

from whisper_vits_svc_tpu.infer import pipeline
from whisper_vits_svc_tpu.infer.retrieval import (
    ArrayIndexRetrieval, DummyRetrieval, compress_features,
)
from whisper_vits_svc_tpu.models.synthesizer import SynthesizerInfer
from whisper_vits_svc_tpu.utils.config import config_from_dict
from whisper_vits_svc_tpu.utils.testing import tiny_hp


@pytest.fixture(scope="module")
def tiny_infer():
    hp = tiny_hp()
    model = pipeline.build_infer_model(hp)
    import jax.numpy as jnp

    t = 8
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, hp.vits.ppg_dim)), jnp.zeros((1, t, hp.vits.vec_dim)),
        jnp.full((1, t), 200.0), jnp.zeros((1, hp.vits.spk_dim)),
        jnp.full((1,), t, jnp.int32),
        jnp.zeros((1, t * hp.data.hop_length, 1)),
    )["params"]
    return hp, model, params


@pytest.fixture(scope="module")
def micro_infer():
    """Fast-tier infer graph: micro depth (1 attn layer / 1 flow / 2 upsample
    stages) — covers the pipeline machinery without the heavy compile."""
    from whisper_vits_svc_tpu.utils.testing import micro_hp

    hp = micro_hp()
    model = pipeline.build_infer_model(hp)
    import jax.numpy as jnp

    t = 8
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, hp.vits.ppg_dim)), jnp.zeros((1, t, hp.vits.vec_dim)),
        jnp.full((1, t), 200.0), jnp.zeros((1, hp.vits.spk_dim)),
        jnp.full((1,), t, jnp.int32),
        jnp.zeros((1, t * hp.data.hop_length, 1)),
    )["params"]
    return hp, model, params


def test_chunked_micro_fast(micro_infer, rng):
    """Fast-tier version of test_chunked_close_to_oneshot: chunk loop with
    whole-utterance excitation + overlap trim vs one-shot synthesis."""
    hp, model, params = micro_infer
    t = 50
    ppg, vec, pit, spk = _features(hp, rng, t)
    one = pipeline.svc_infer(
        model, params, DummyRetrieval(), spk, pit, ppg, vec, hp,
        noise_scale=0.0, out_chunk=t + 10, hop_frame=4,
    )
    chunked = pipeline.svc_infer(
        model, params, DummyRetrieval(), spk, pit, ppg, vec, hp,
        noise_scale=0.0, out_chunk=20, hop_frame=4,
    )
    assert len(one) == len(chunked) == t * hp.data.hop_length
    assert np.isfinite(chunked).all()
    assert np.median(np.abs(one - chunked)) < 2e-2


def _features(hp, rng, t):
    return (
        rng.standard_normal((t, hp.vits.ppg_dim)).astype(np.float32) * 0.1,
        rng.standard_normal((t, hp.vits.vec_dim)).astype(np.float32) * 0.1,
        rng.uniform(100, 400, t).astype(np.float32),
        rng.standard_normal(hp.vits.spk_dim).astype(np.float32) * 0.1,
    )


@pytest.mark.slow
def test_chunked_close_to_oneshot(tiny_infer, rng):
    """Chunk loop with overlap trim stays close to single-shot synthesis.

    Exact equality is impossible (the prior encoder's attention context is the
    chunk, not the utterance — true of the reference too); the whole-utterance
    excitation + overlap trim (svc_inference.py:97-131) keeps the deviation
    small and click-free at seams.
    """
    hp, model, params = tiny_infer
    t = 50
    ppg, vec, pit, spk = _features(hp, rng, t)

    one = pipeline.svc_infer(
        model, params, DummyRetrieval(), spk, pit, ppg, vec, hp,
        noise_scale=0.0, out_chunk=t + 10, hop_frame=4,
    )
    chunked = pipeline.svc_infer(
        model, params, DummyRetrieval(), spk, pit, ppg, vec, hp,
        noise_scale=0.0, out_chunk=20, hop_frame=4,
    )
    assert len(one) == len(chunked) == t * hp.data.hop_length
    assert np.isfinite(chunked).all()
    diff = np.abs(one - chunked)
    assert np.median(diff) < 2e-2
    assert diff.max() < 0.2
    # no clicks at the seams: the sample-to-sample jump at each chunk seam must
    # be comparable to the signal's own jumps
    hop = hp.data.hop_length
    seams = np.arange(20, t, 20) * hop
    jumps = np.abs(np.diff(chunked))
    assert jumps[seams - 1].max() <= jumps.max() * 1.5 + 1e-6


@pytest.mark.slow
def test_chunk_batched_matches_sequential(tiny_infer, rng):
    """chunk_batch>1 stacks chunks on a vmapped batch axis with per-chunk rngs
    (same fold_in stream as the sequential walk), so output must match the
    sequential walk — including a trailing group padded to the static batch
    shape. Batched vs unbatched XLA programs fuse differently, so allow only
    float reassociation noise."""
    hp, model, params = tiny_infer
    t = 50  # out_chunk=20, hop_frame=4 -> 3 chunks, last group padded
    ppg, vec, pit, spk = _features(hp, rng, t)
    kw = dict(noise_scale=1.0, seed=7, out_chunk=20, hop_frame=4)

    seq = pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg,
                             vec, hp, **kw)
    bat = pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg,
                             vec, hp, chunk_batch=2, **kw)
    np.testing.assert_allclose(seq, bat, atol=2e-6, rtol=2e-6)


@pytest.mark.slow
def test_chunk_batched_mesh_sharded(tiny_infer, rng):
    """Chunk batch sharded across the 8-device CPU mesh (data-parallel
    long-audio synthesis, SURVEY.md §5.7) matches the sequential output."""
    from whisper_vits_svc_tpu.parallel import mesh as pmesh

    hp, model, params = tiny_infer
    t = 100  # out_chunk=12, hop_frame=4 -> 9 chunks over 8 devices
    ppg, vec, pit, spk = _features(hp, rng, t)
    kw = dict(noise_scale=1.0, seed=3, out_chunk=12, hop_frame=4)

    seq = pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg,
                             vec, hp, **kw)
    mesh = pmesh.create_mesh()
    shd = pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg,
                             vec, hp, mesh=mesh, **kw)
    assert len(shd) == len(seq) == t * hp.data.hop_length
    # CPU collectives reduce in a fixed order; allow only tiny reassociation
    np.testing.assert_allclose(shd, seq, atol=1e-5, rtol=1e-5)

    # Pallas snake stays enabled under the mesh (shard_map wraps the
    # per-chunk body — VERDICT r1 #6); interpret-mode kernel on CPU.
    model_pl = pipeline.build_infer_model(hp, pallas_snake=True)
    shd_pl = pipeline.svc_infer(model_pl, params, DummyRetrieval(), spk, pit,
                                ppg, vec, hp, mesh=mesh, **kw)
    np.testing.assert_allclose(shd_pl, shd, atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_bf16_inference_close_to_f32(tiny_infer, rng):
    import jax.numpy as jnp

    hp, model, params = tiny_infer
    t = 30
    ppg, vec, pit, spk = _features(hp, rng, t)
    kw = dict(noise_scale=0.0, out_chunk=t + 10, hop_frame=4)
    f32 = pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg, vec,
                             hp, **kw)
    bf16 = pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg, vec,
                              hp, compute_dtype=jnp.bfloat16, **kw)
    assert bf16.dtype == np.float32 and len(bf16) == len(f32)
    assert np.isfinite(bf16).all()
    # bf16 rounding through ~60 conv layers: loose but bounded agreement
    assert np.median(np.abs(bf16 - f32)) < 0.05
    assert np.corrcoef(bf16, f32)[0, 1] > 0.9


def test_retrieval_blend_math(rng):
    bank = rng.standard_normal((100, 16)).astype(np.float32)
    q = bank[:5] + 0.01  # near-duplicates of bank rows
    r = ArrayIndexRetrieval(bank, bank, ratio=1.0, n_nearest=1)
    out = r.retriv_whisper(q)
    # nearest neighbor of each query is its own bank row
    np.testing.assert_allclose(out, bank[:5], atol=1e-4)

    r0 = ArrayIndexRetrieval(bank, bank, ratio=0.0, n_nearest=3)
    np.testing.assert_allclose(r0.retriv_hubert(q), q, atol=1e-6)


def test_compress_features_passthrough(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    assert compress_features(x, threshold=200).shape == (100, 8)
    c = compress_features(x, threshold=50, n_clusters=10)
    assert c.shape == (10, 8)


def test_csv_pitch_roundtrip(tmp_path):
    pit = np.array([0.0, 123.4, 456.7, 0.0], np.float32)
    path = str(tmp_path / "p.csv")
    pipeline.save_csv_pitch(pit, path)
    back = pipeline.load_csv_pitch(path)
    np.testing.assert_array_equal(back, np.floor(pit))  # int truncation quirk


def test_vad_post_filter(rng):
    from whisper_vits_svc_tpu.infer.post import apply_vad_mask, get_speech_timestamps

    sr = 16000
    t = np.arange(2 * sr) / sr
    speech = np.sin(2 * np.pi * 220 * t) * 0.5
    audio = np.concatenate([np.zeros(sr // 2), speech, np.zeros(sr // 2)]).astype(np.float32)
    segs = get_speech_timestamps(audio)
    assert len(segs) >= 1
    assert abs(segs[0]["start"] - sr // 2) < sr // 8

    svc = np.ones(len(audio) * 2, np.float32)
    out = apply_vad_mask(svc, audio)
    assert out[:100].max() == 0.0          # leading silence muted
    assert out[len(audio) - 100 : len(audio) + 100].max() == 1.0  # speech kept


def test_merge_and_eva(tmp_path, rng):
    from flax import serialization

    from whisper_vits_svc_tpu.infer.tools import average_model, merge_model, mix_speakers

    tree_a = {"dec": {"w": np.ones((2, 2), np.float32)}}
    tree_b = {"dec": {"w": np.zeros((2, 2), np.float32)}}
    for name, tree in [("a", tree_a), ("b", tree_b)]:
        with open(tmp_path / f"{name}.ckpt", "wb") as f:
            f.write(serialization.msgpack_serialize({"model_g": tree}))
    m = merge_model(str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt"),
                    str(tmp_path / "m.ckpt"), ratio=0.25)
    np.testing.assert_allclose(m["dec"]["w"], 0.25)
    avg = average_model([str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")],
                        str(tmp_path / "avg.ckpt"))
    np.testing.assert_allclose(avg["dec"]["w"], 0.5)

    np.save(tmp_path / "s1.npy", np.ones(4, np.float32))
    np.save(tmp_path / "s2.npy", np.full(4, 3.0, np.float32))
    mixed = mix_speakers([str(tmp_path / "s1.npy"), str(tmp_path / "s2.npy")],
                         [0.5, 0.5], str(tmp_path / "mix.npy"))
    np.testing.assert_allclose(mixed, 2.0)


def test_preprocess_driver(tmp_path, rng):
    from whisper_vits_svc_tpu.data.preprocess import Extractors, preprocess
    from whisper_vits_svc_tpu.utils.audio_io import save_wav

    hp = tiny_hp()
    raw = tmp_path / "dataset_raw" / "spk0"
    raw.mkdir(parents=True)
    sr = hp.data.sampling_rate
    for i in range(3):
        save_wav(str(raw / f"u{i}.wav"), rng.standard_normal(sr) * 0.1, sr)

    out = tmp_path / "data_svc"
    files = tmp_path / "files"
    stats = preprocess(str(tmp_path / "dataset_raw"), str(out), str(files),
                       hp.data, Extractors(), valid_count=1, progress=False)
    assert stats["items"] == 3
    # specs + resampled waves exist; filelist rows dropped (no pitch/ppg/...)
    assert len(os.listdir(out / "specs" / "spk0")) == 3
    assert len(os.listdir(out / "waves-16k" / "spk0")) == 3
    spec = np.load(out / "specs" / "spk0" / "u0.spec.npy")
    assert spec.shape[1] == hp.data.filter_length // 2 + 1

    # fill the missing caches with synthetic features -> rows appear
    for sub, dim, hopdiv in [("pitch", None, 1), ("hubert", hp.vits.vec_dim, 2),
                             ("whisper", hp.vits.ppg_dim, 2), ("speaker", None, 0)]:
        d = out / sub / "spk0"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            t = spec.shape[0]
            if sub == "pitch":
                np.save(d / f"u{i}.pit.npy", rng.uniform(100, 300, t).astype(np.float32))
            elif sub == "speaker":
                np.save(d / f"u{i}.spk.npy", rng.standard_normal(hp.vits.spk_dim).astype(np.float32))
            else:
                np.save(d / f"u{i}.{'vec' if sub == 'hubert' else 'ppg'}.npy",
                        rng.standard_normal((t // 2 + 2, dim)).astype(np.float32))
    from whisper_vits_svc_tpu.data.preprocess import build_filelists

    rows = build_filelists(str(out), str(files), valid_count=1)
    assert len(rows) == 3
    assert os.path.isfile(files / "train.txt")


def test_stablehlo_serving_roundtrip(tmp_path, rng):
    """jax.export serving artifact: serialize the micro synthesis graph
    (weights baked in), deserialize from bytes, and the call must match the
    direct model.apply output; the artifact is a self-contained file."""
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.infer import pipeline, serving
    from whisper_vits_svc_tpu.utils.testing import micro_hp

    hp = micro_hp()
    model = pipeline.build_infer_model(hp, pallas_snake=False)
    b, t = 1, 24
    hop = hp.data.hop_length
    ppg = jnp.asarray(rng.standard_normal((b, t, hp.vits.ppg_dim)), jnp.float32) * 0.1
    vec = jnp.asarray(rng.standard_normal((b, t, hp.vits.vec_dim)), jnp.float32) * 0.1
    pit = jnp.asarray(rng.uniform(100, 400, (b, t)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((b, hp.vits.spk_dim)), jnp.float32) * 0.1
    lengths = jnp.full((b,), t, jnp.int32)
    source = jnp.asarray(
        rng.standard_normal((b, t * hop, 1)), jnp.float32) * 0.1
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        ppg, vec, pit, spk, lengths, source,
    )["params"]

    path = str(tmp_path / "serving.bin")
    n = serving.export_synthesis(params, hp, path, chunk_frames=t, batch=b)
    assert n > 0 and os.path.getsize(path) == n

    fn = serving.load_synthesis(path)
    seed = jnp.int32(7)
    got = np.asarray(fn(ppg, vec, pit, spk, lengths, source, seed))
    want = np.asarray(
        serving.build_synthesis_fn(params, hp)(ppg, vec, pit, spk, lengths,
                                               source, seed))
    assert got.shape == (b, t * hop, 1)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    # a different seed draws different prior noise (per-chunk variation,
    # ADVICE r3) and the same seed reproduces exactly
    other = np.asarray(fn(ppg, vec, pit, spk, lengths, source, jnp.int32(8)))
    assert not np.array_equal(got, other)
    np.testing.assert_array_equal(
        got, np.asarray(fn(ppg, vec, pit, spk, lengths, source, seed)))


def test_extractor_serving_roundtrip(tmp_path, rng):
    """Extractor serving artifacts (crepe-tiny + reduced hubert): serialized
    call == direct apply."""
    import jax
    import jax.numpy as jnp

    from whisper_vits_svc_tpu.infer import serving
    from whisper_vits_svc_tpu.models.crepe import Crepe, normalize_frames
    from whisper_vits_svc_tpu.models.hubert import HubertSoft

    cmodel = Crepe(capacity="tiny")
    frames = jnp.asarray(rng.standard_normal((4, 1024)), jnp.float32)
    cparams = cmodel.init(jax.random.PRNGKey(0), frames)["params"]
    cpath = str(tmp_path / "crepe.bin")
    assert serving.export_extractor("crepe", cparams, cpath, batch=4,
                                    model=cmodel) > 0
    got = np.asarray(serving.load_exported(cpath)(frames))
    want = np.asarray(cmodel.apply({"params": cparams},
                                   normalize_frames(frames)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    hmodel = HubertSoft(n_layers=1)
    wav = jnp.asarray(rng.standard_normal((1, 16000)), jnp.float32) * 0.1
    hparams = hmodel.init(jax.random.PRNGKey(1), wav)["params"]
    hpath = str(tmp_path / "hubert.bin")

    def hfn(w):
        return hmodel.apply({"params": hparams}, w)

    assert serving.export_jitted(
        hfn, (jax.ShapeDtypeStruct((1, 16000), jnp.float32),), hpath) > 0
    got = np.asarray(serving.load_exported(hpath)(wav))
    want = np.asarray(hfn(wav))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pitch2source_bucketed_exact(tiny_infer, rng):
    """Bucketed jitted excitation == eager model.pitch2source: the phase
    cumsum is a prefix scan, so zero-padded f0 tail frames cannot affect the
    real prefix."""
    import jax.numpy as jnp

    hp, model, params = tiny_infer
    for t in [7, 16, 33]:
        pit = rng.uniform(100, 400, t).astype(np.float32)
        want = np.asarray(model.pitch2source(jnp.asarray(pit)[None, :]))
        got = pipeline.pitch2source_bucketed(model, pit, bucket_frames=16)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_svc_infer_program_reused_across_calls(micro_infer, rng):
    """Two svc_infer calls must share one compiled chunk program (the
    per-call jax.jit closure of round 3 re-traced every call)."""
    hp, model, params = micro_infer
    t = 30
    ppg, vec, pit, spk = _features(hp, rng, t)
    kw = dict(noise_scale=0.0, out_chunk=20, hop_frame=4)
    pipeline.svc_infer(model, params, DummyRetrieval(), spk, pit, ppg, vec,
                       hp, **kw)
    size_after_first = pipeline._chunk_program._cache_size()
    ppg2, vec2, pit2, spk2 = _features(hp, rng, t)
    pipeline.svc_infer(model, params, DummyRetrieval(), spk2, pit2, ppg2,
                       vec2, hp, **kw)
    assert pipeline._chunk_program._cache_size() == size_after_first
