"""Native C++ loader: build, parse-parity with numpy/scipy, thread-pool batch."""

import numpy as np
import pytest

from whisper_vits_svc_tpu.data import native_loader as nl
from whisper_vits_svc_tpu.utils.audio_io import load_wav, save_wav

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native toolchain unavailable"
)


def test_wav_parity(tmp_path, rng):
    path = str(tmp_path / "a.wav")
    audio = (rng.standard_normal(12345) * 0.3).astype(np.float32)
    save_wav(path, audio, 32000)
    ref, sr_ref = load_wav(path)
    got = nl.load_wav_native(path)
    assert got is not None
    native, sr = got
    assert sr == sr_ref == 32000
    np.testing.assert_allclose(native, ref, atol=1e-6)


def test_npy_parity(tmp_path, rng):
    for shape in [(100,), (50, 16), (3, 4, 5)]:
        path = str(tmp_path / f"x{len(shape)}.npy")
        x = rng.standard_normal(shape).astype(np.float32)
        np.save(path, x)
        got = nl.load_npy_native(path)
        assert got is not None
        np.testing.assert_array_equal(got, x)


def test_npy_batch(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(16):
        p = str(tmp_path / f"b{i}.npy")
        a = rng.standard_normal((20 + i, 8)).astype(np.float32)
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    paths.append(str(tmp_path / "missing.npy"))
    out = nl.load_npy_batch(paths, max_elems_each=1 << 12, n_threads=4)
    assert out[-1] is None
    for a, got in zip(arrays, out[:-1]):
        np.testing.assert_array_equal(got, a)


def test_rejects_non_f32(tmp_path):
    path = str(tmp_path / "i64.npy")
    np.save(path, np.arange(10))
    assert nl.load_npy_native(path) is None
