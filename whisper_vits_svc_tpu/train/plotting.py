"""Waveform / spectrogram images for TensorBoard validation panels.

Reference vits_extend/plotting.py:19-49 — renders fake/real pairs so a human
can A/B them per eval (SURVEY.md §5.5). Agg backend, returns HWC uint8 arrays.
"""

from __future__ import annotations

import numpy as np


def _fig_to_array(fig) -> np.ndarray:
    fig.canvas.draw()
    data = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    return data.reshape(h, w, 4)[..., :3].copy()


def plot_waveform_to_numpy(waveform: np.ndarray) -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    ax.plot(waveform, linewidth=0.5)
    ax.set_xlabel("samples")
    ax.set_ylabel("amplitude")
    fig.tight_layout()
    out = _fig_to_array(fig)
    plt.close(fig)
    return out


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """spectrogram: [bins, frames] (dB or log scale)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("frames")
    ax.set_ylabel("bins")
    fig.tight_layout()
    out = _fig_to_array(fig)
    plt.close(fig)
    return out


def amplitude_to_db(mag: np.ndarray, top_db: float = 80.0) -> np.ndarray:
    """librosa.amplitude_to_db(ref=np.max) equivalent (writer.py:27-28)."""
    db = 20.0 * np.log10(np.maximum(mag, 1e-10) / max(mag.max(), 1e-10))
    return np.maximum(db, -top_db)
