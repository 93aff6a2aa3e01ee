"""Tiny configs + synthetic batches for tests, dryruns, and benches."""

from __future__ import annotations

import numpy as np

from .config import Config, config_from_dict


def tiny_hp(batch_size: int = 2) -> Config:
    """A miniature hp tree with the full architecture shape (fast on CPU)."""
    return config_from_dict(
        dict(
            train=dict(
                seed=1234, learning_rate=2e-4, betas=[0.8, 0.99], lr_decay=0.999875,
                eps=1e-9, batch_size=batch_size, accum_step=2, c_stft=9, c_mel=1.0,
                c_kl=0.2,
            ),
            data=dict(
                segment_size=256, sampling_rate=3200, filter_length=128,
                hop_length=32, win_length=128, mel_channels=8, mel_fmin=50.0,
                mel_fmax=1600.0, max_wav_value=32768.0,
            ),
            vits=dict(
                ppg_dim=32, vec_dim=16, spk_dim=16, gin_channels=16,
                inter_channels=32, hidden_channels=32, filter_channels=64,
            ),
            gen=dict(
                upsample_input=32, upsample_rates=[4, 4, 2],
                upsample_kernel_sizes=[8, 8, 4], upsample_initial_channel=32,
                resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
            ),
            mpd=dict(periods=[2, 3], kernel_size=5, stride=3, lReLU_slope=0.2),
            mrd=dict(resolutions=[[64, 16, 32], [128, 32, 64]], lReLU_slope=0.2),
        )
    )


def micro_hp(batch_size: int = 2) -> Config:
    """The fast-tier config: every architectural element present exactly once
    (1 transformer layer, 1 posterior WN layer, 1 flow coupling, 2 upsample
    stages, 1 resblock dilation, 1 MPD period, 1 MRD resolution) so the XLA
    graph is ~10x smaller than tiny_hp's and the train step compiles in
    seconds on CPU. Semantics are identical — only depth changes."""
    hp = tiny_hp(batch_size=batch_size)
    hp.vits.update(enc_p_layers=1, enc_q_layers=1, flow_wn_layers=1, n_flows=1)
    hp.gen.update(
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1]],
    )
    hp.data.update(segment_size=128, hop_length=8)
    hp.mpd.update(periods=[2])
    hp.mrd.update(resolutions=[[64, 16, 32]])
    return hp


def synthetic_batch(hp: Config, rng: np.random.Generator, b: int = 2, t: int = 20) -> dict:
    hop = hp.data.hop_length
    return dict(
        ppg=rng.standard_normal((b, t, hp.vits.ppg_dim)).astype(np.float32) * 0.1,
        vec=rng.standard_normal((b, t, hp.vits.vec_dim)).astype(np.float32) * 0.1,
        pit=rng.uniform(100, 400, (b, t)).astype(np.float32),
        spk=rng.standard_normal((b, hp.vits.spk_dim)).astype(np.float32),
        spec=np.abs(
            rng.standard_normal((b, t, hp.data.filter_length // 2 + 1))
        ).astype(np.float32),
        audio=(rng.standard_normal((b, t * hop, 1)) * 0.2).astype(np.float32),
        ppg_l=np.full((b,), t, np.int32),
        spec_l=np.full((b,), t, np.int32),
    )
