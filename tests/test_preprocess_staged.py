"""Stage-major batched preprocessing driver == the serial per-utterance loop.

The staged driver (data/preprocess.py::_preprocess_staged) batches extractor
windows across utterances through one compiled program per extractor and
overlaps host IO with device compute; its outputs must match the serial
round-3 loop it replaced (pitch bit-exact — same seeded RNG; features and
specs to float tolerance — same math, different batch shapes).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_vits_svc_tpu.data.preprocess import (
    Extractors, compute_spec_bucketed, preprocess,
)
from whisper_vits_svc_tpu.utils.audio_io import save_wav


def _make_raw(root, rng):
    """2 speakers x varied-length harmonic wavs at 32 kHz."""
    lengths = {"spk_a": [0.7, 1.3, 2.1], "spk_b": [0.9, 1.7]}
    for spk, secs in lengths.items():
        d = os.path.join(root, spk)
        os.makedirs(d)
        for i, s in enumerate(secs):
            t = np.arange(int(32000 * s)) / 32000.0
            f0 = 160.0 + 40 * i
            x = (0.4 * np.sin(2 * np.pi * f0 * t)
                 + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
                 + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
            save_wav(os.path.join(d, f"u{i}.wav"), x, 32000)
    return sum(len(v) for v in lengths.values())


def _tiny_extractors():
    from whisper_vits_svc_tpu.models.crepe import Crepe
    from whisper_vits_svc_tpu.models.hubert import HubertSoft
    from whisper_vits_svc_tpu.models.speaker_encoder import LSTMSpeakerEncoder
    from whisper_vits_svc_tpu.models.whisper import WhisperEncoder

    ex = Extractors()
    wm = WhisperEncoder(n_mels=80, n_ctx=1500, n_state=64, n_head=4, n_layer=1)
    ex.whisper = (wm, wm.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 1500, 80)))["params"])
    hm = HubertSoft(n_layers=1)
    ex.hubert = (hm, hm.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 32000)))["params"])
    cm = Crepe("tiny")
    ex.crepe = (cm, cm.init(jax.random.PRNGKey(2),
                            jnp.zeros((4, 1024)))["params"])
    sm = LSTMSpeakerEncoder(input_dim=80, proj_dim=16, lstm_dim=32,
                            num_layers=2)
    ex.speaker = (sm, sm.init(jax.random.PRNGKey(3),
                              jnp.zeros((1, 60, 80)))["params"])
    return ex


@pytest.mark.slow
def test_staged_driver_matches_serial(tmp_path, rng):
    raw = str(tmp_path / "dataset_raw")
    os.makedirs(raw)
    n_items = _make_raw(raw, rng)
    ex = _tiny_extractors()

    kw = dict(valid_count=1, progress=False, hubert_window_seconds=2)
    stats_a = preprocess(raw, str(tmp_path / "svc_serial"),
                         str(tmp_path / "files_serial"), None, ex,
                         serial=True, **kw)
    stats_b = preprocess(raw, str(tmp_path / "svc_staged"),
                         str(tmp_path / "files_staged"), None, ex,
                         batch_windows=4, **kw)
    assert stats_a["items"] == stats_b["items"] == n_items
    assert stats_a["rows"] == stats_b["rows"] == n_items

    for sub, tol in [("pitch", 0.0), ("whisper", 1e-4), ("hubert", 1e-4),
                     ("speaker", 1e-4), ("specs", 1e-5), ("singer", 1e-4)]:
        dir_a = str(tmp_path / "svc_serial" / sub)
        dir_b = str(tmp_path / "svc_staged" / sub)
        files = []
        for root, _dirs, fs in os.walk(dir_a):
            files += [os.path.relpath(os.path.join(root, f), dir_a)
                      for f in fs if f.endswith(".npy")]
        assert files, sub
        for f in sorted(files):
            a = np.load(os.path.join(dir_a, f))
            b = np.load(os.path.join(dir_b, f))
            assert a.shape == b.shape, (sub, f)
            if tol == 0.0:
                np.testing.assert_array_equal(a, b, err_msg=f"{sub}/{f}")
            else:
                np.testing.assert_allclose(a, b, rtol=tol, atol=tol,
                                           err_msg=f"{sub}/{f}")

    # idempotent re-run: staged driver sees complete caches, does nothing
    stats_c = preprocess(raw, str(tmp_path / "svc_staged"),
                         str(tmp_path / "files_staged"), None, ex,
                         batch_windows=4, **kw)
    assert stats_c["rows"] == n_items


def test_spec_bucketed_matches_linear_spectrogram(rng):
    from whisper_vits_svc_tpu.ops.stft import linear_spectrogram

    for n in [3210, 32000, 45001]:
        a = (rng.standard_normal(n) * 0.3).astype(np.float32)
        ref = np.asarray(linear_spectrogram(jnp.asarray(a)[None], 1024, 320,
                                            1024))[0]
        got = compute_spec_bucketed(a, 1024, 320, 1024)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
