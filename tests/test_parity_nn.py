"""Module-level numerical parity vs the reference PyTorch implementation.

Strategy (SURVEY.md §4b): instantiate the reference torch modules (imported
read-only from /root/reference) with seeded random weights, convert their
state_dicts through models/convert.py, and require our flax modules to
reproduce the outputs on identical inputs. Stochastic nodes are disabled on
both sides (torch randn/rand patched to zeros; our noise_scale=0 / rng=None).
"""

import sys
import types
from unittest import mock

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_vits_svc_tpu.models import convert  # noqa: E402


def _seed(n=0):
    torch.manual_seed(1234 + n)
    return np.random.default_rng(1234 + n)


def _zeros_like(x, **kw):
    return torch.zeros_like(x)


# ---------------------------------------------------------------- WN


def test_wn_parity():
    from vits import modules as tmod

    from whisper_vits_svc_tpu.nn.wn import WN

    rng = _seed()
    ref = tmod.WN(192, 5, 1, 16, gin_channels=256).eval()
    x = rng.standard_normal((2, 192, 50)).astype(np.float32)
    g = rng.standard_normal((2, 256, 1)).astype(np.float32)
    mask = np.ones((2, 1, 50), np.float32)
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(x), torch.from_numpy(mask), g=torch.from_numpy(g)).numpy()

    ours = WN(192, 5, 1, 16, gin_channels=256)
    params = convert.wn_params(ref.state_dict(), "", 16, has_cond=True)
    # strip leading '.' introduced by empty prefix
    params = {k: v for k, v in params.items()}
    init = ours.init(
        jax.random.PRNGKey(0),
        x.transpose(0, 2, 1),
        mask.transpose(0, 2, 1),
        g=g.transpose(0, 2, 1),
    )["params"]
    merged = convert.merge_into(init, params)
    y = ours.apply(
        {"params": merged},
        x.transpose(0, 2, 1),
        mask.transpose(0, 2, 1),
        g=g.transpose(0, 2, 1),
    )
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref_y, rtol=2e-4, atol=2e-4)


def test_wn_cond_prefix_keys():
    # wn_params with a module prefix must produce keys without the prefix dot issue
    from vits import modules as tmod

    ref = tmod.WN(8, 3, 1, 2, gin_channels=4)
    sd = {f"enc.{k}": v for k, v in ref.state_dict().items()}
    p = convert.wn_params(sd, "enc", 2, has_cond=True)
    assert "in_layers_0" in p and "cond_layer" in p


# ---------------------------------------------------------------- attention


def test_rel_pos_transformer_parity():
    from vits import attentions as tattn

    from whisper_vits_svc_tpu.nn.attention import RelPosTransformer

    rng = _seed(1)
    ref = tattn.Encoder(192, 640, 2, 6, 3, 0.0).eval()
    x = rng.standard_normal((2, 192, 41)).astype(np.float32)
    mask = np.ones((2, 1, 41), np.float32)
    mask[1, :, 30:] = 0.0
    with torch.no_grad():
        ref_y = ref(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    ours = RelPosTransformer(192, 640, 2, 6, 3, 0.0)
    params = convert.rel_pos_transformer(ref.state_dict(), "", 6)
    init = ours.init(
        jax.random.PRNGKey(0), x.transpose(0, 2, 1), mask.transpose(0, 2, 1)
    )["params"]
    merged = convert.merge_into(init, params)
    y = ours.apply({"params": merged}, x.transpose(0, 2, 1), mask.transpose(0, 2, 1))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), ref_y, rtol=5e-4, atol=5e-4
    )


# ---------------------------------------------------------------- flow


def test_flow_parity_and_invertibility():
    from vits import models as tmodels

    from whisper_vits_svc_tpu.nn.flow import ResidualCouplingBlock

    rng = _seed(2)
    ref = tmodels.ResidualCouplingBlock(192, 192, 5, 1, 4, gin_channels=256).eval()
    x = rng.standard_normal((2, 192, 37)).astype(np.float32)
    g = rng.standard_normal((2, 256)).astype(np.float32)
    mask = np.ones((2, 1, 37), np.float32)
    with torch.no_grad():
        ref_y, ref_logdet = ref(
            torch.from_numpy(x), torch.from_numpy(mask), g=torch.from_numpy(g)
        )
        ref_rev, ref_logdet_r = ref(
            torch.from_numpy(x), torch.from_numpy(mask), g=torch.from_numpy(g),
            reverse=True,
        )

    ours = ResidualCouplingBlock(192, 192, 5, 1, 4, gin_channels=256)
    # reference state dict here has keys 'flows.N...' without the 'flow.' prefix
    params = convert.coupling_block(
        {f"flow.{k}": v for k, v in ref.state_dict().items()}, "flow"
    )
    xt = x.transpose(0, 2, 1)
    mt = mask.transpose(0, 2, 1)
    init = ours.init(jax.random.PRNGKey(0), xt, mt, g)["params"]
    merged = convert.merge_into(init, params)

    y, logdet = ours.apply({"params": merged}, xt, mt, g)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), ref_y.numpy(), rtol=3e-4, atol=3e-4
    )
    np.testing.assert_allclose(np.asarray(logdet), ref_logdet.numpy(), rtol=2e-3)

    rev, logdet_r = ours.apply({"params": merged}, xt, mt, g, reverse=True)
    np.testing.assert_allclose(
        np.asarray(rev).transpose(0, 2, 1), ref_rev.numpy(), rtol=3e-4, atol=3e-4
    )

    # invertibility: reverse(forward(x)) == x
    back, _ = ours.apply({"params": merged}, np.asarray(y), mt, g, reverse=True)
    np.testing.assert_allclose(np.asarray(back), xt, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- NSF source


def _hp_gen():
    return types.SimpleNamespace(
        gen=types.SimpleNamespace(
            upsample_input=192,
            upsample_rates=[5, 4, 4, 2, 2],
            upsample_kernel_sizes=[15, 8, 8, 4, 4],
            upsample_initial_channel=320,
            resblock_kernel_sizes=[3, 7, 11],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        ),
        vits=types.SimpleNamespace(spk_dim=256),
        data=types.SimpleNamespace(sampling_rate=32000),
    )


def test_sine_source_parity():
    from vits_decoder.nsf import SourceModuleHnNSF

    from whisper_vits_svc_tpu.nn.nsf import source_hn_nsf

    rng = _seed(3)
    f0 = rng.uniform(80, 600, (2, 40)).astype(np.float32)
    f0[0, 5:9] = 0.0  # unvoiced run
    hop = 320

    ref = SourceModuleHnNSF(sampling_rate=32000)
    f0_up = np.repeat(f0, hop, axis=1)[..., None]  # nearest x320 (generator.py:122)
    with mock.patch.object(torch, "rand", lambda *s, **kw: torch.zeros(*s, **kw)), \
         mock.patch.object(torch, "randn_like", _zeros_like):
        with torch.no_grad():
            ref_y = ref(torch.from_numpy(f0_up)).numpy()

    ours = np.asarray(source_hn_nsf(f0, hop, 32000, rng=None))
    assert ours.shape == ref_y.shape
    np.testing.assert_allclose(ours, ref_y, atol=5e-2)
    # tighter check against float64 ground truth of the same math
    f64 = _source_f64(f0, hop, 32000)
    np.testing.assert_allclose(ours, f64, atol=3e-3)
    # and the torch f32 path should not be *closer* to f64 than ours
    ref_err = np.abs(ref_y - f64).max()
    our_err = np.abs(ours - f64).max()
    assert our_err <= ref_err + 1e-3


def _source_f64(f0, hop, sr):
    """float64 ground-truth harmonic source (same math, exact phase)."""
    from whisper_vits_svc_tpu.nn.nsf import MERGE_B, MERGE_W

    B, T = f0.shape
    dim = 11
    f = f0.astype(np.float64)[..., None] * np.arange(1, dim + 1)
    # per-sample phase via exact cumsum
    f_up = np.repeat(f, hop, axis=1)  # [B, T*hop, dim]
    phase = np.cumsum(f_up / sr, axis=1)
    sines = np.sin(2 * np.pi * phase) * 0.1
    uv = (np.repeat(f0, hop, axis=1) > 0).astype(np.float64)[..., None]
    sines = sines * uv
    merged = sines @ MERGE_W.astype(np.float64)[:, None] + float(MERGE_B)
    return np.tanh(merged).astype(np.float32)


# ---------------------------------------------------------------- generator


@pytest.mark.slow
def test_generator_inference_parity():
    from vits_decoder.generator import Generator as TGen

    from whisper_vits_svc_tpu.models.generator import Generator

    _seed(4)
    hp = _hp_gen()
    ref = TGen(hp)
    ref.train(False)  # reference Generator.eval() is overridden and returns None
    rng = np.random.default_rng(7)
    B, T = 1, 12
    x = rng.standard_normal((B, 192, T)).astype(np.float32) * 0.3
    spk = rng.standard_normal((B, 256)).astype(np.float32)
    har = (rng.standard_normal((B, 1, T * 320)) * 0.05).astype(np.float32)
    with torch.no_grad():
        ref_y = ref.inference(
            torch.from_numpy(spk), torch.from_numpy(x), torch.from_numpy(har)
        ).numpy()

    ours = Generator()
    params = convert.generator(ref.state_dict(), "")
    xt = x.transpose(0, 2, 1)
    hart = har.transpose(0, 2, 1)
    init = ours.init(
        {"params": jax.random.PRNGKey(0)}, spk, xt, har_source=hart
    )["params"]
    merged = convert.merge_into(init, params)
    y = ours.apply({"params": merged}, spk, xt, har_source=hart)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), ref_y, rtol=2e-3, atol=2e-3
    )


# ---------------------------------------------------------------- discriminators


@pytest.mark.parametrize("resolutions", [
    pytest.param([(512, 50, 240)], id="512"),
    pytest.param([(1024, 120, 600)], id="1024", marks=pytest.mark.slow),
])
def test_mrd_fold_freq_exactness(resolutions):
    """Freq-folded DiscriminatorR == unfolded path: same params, same fmaps,
    same scores, same parameter gradients (up to float summation order).
    One resolution in the fast tier (the fold math is resolution-agnostic);
    the second is a slow-tier cross-check."""
    from whisper_vits_svc_tpu.models.discriminator import DiscriminatorR as R

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 1200, 1)) * 0.3, jnp.float32)
    for res in resolutions:
        d_ref = R(res, fold_freq=False)
        d_fold = R(res, fold_freq=True)
        p = d_ref.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(
            d_fold.init(jax.random.PRNGKey(0), x)["params"]
        ) == jax.tree_util.tree_structure(p)
        f_ref, s_ref = jax.jit(d_ref.apply)({"params": p}, x)
        f_fold, s_fold = jax.jit(d_fold.apply)({"params": p}, x)
        np.testing.assert_allclose(s_fold, s_ref, atol=2e-5, rtol=1e-5)
        for a, b in zip(f_fold, f_ref):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)

        if res[0] != 512:
            continue  # gradient parity once is enough (keeps the tier fast)

        def loss(params, mod):
            fmap, score = mod.apply({"params": params}, x)
            return jnp.mean(jnp.square(score - 1.0)) + sum(
                jnp.mean(jnp.abs(f)) for f in fmap)

        g_ref = jax.jit(jax.grad(loss), static_argnums=1)(p, d_ref)
        g_fold = jax.jit(jax.grad(loss), static_argnums=1)(p, d_fold)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=3e-5, rtol=2e-4),
            g_fold, g_ref)


def test_mrd_folded_fmaps_loss_equality():
    """fold_fmaps=True (folded-layout, count-corrected fmaps — the trainer's
    mode) must give the SAME feature-matching/adversarial loss values and
    parameter gradients as the unfolded fmaps, without any unfold in the
    graph. The scores are identical tensors; only the fmap layout differs."""
    from whisper_vits_svc_tpu.models.discriminator import DiscriminatorR as R
    from whisper_vits_svc_tpu.train import losses

    rng = np.random.default_rng(23)
    res = (512, 50, 240)
    fake = jnp.asarray(rng.standard_normal((2, 1200, 1)) * 0.3, jnp.float32)
    real = jnp.asarray(rng.standard_normal((2, 1200, 1)) * 0.3, jnp.float32)
    d_plain = R(res, fold_freq=True, fold_fmaps=False)
    d_fold = R(res, fold_freq=True, fold_fmaps=True)
    p = d_plain.init(jax.random.PRNGKey(0), fake)["params"]

    def gan_losses(params, mod):
        df = [mod.apply({"params": params}, fake)]
        dr = [mod.apply({"params": params}, real)]
        return (losses.feature_matching_loss(df, dr)
                + losses.generator_adversarial_loss(df)
                + losses.discriminator_adversarial_loss(df, dr))

    l_plain = jax.jit(gan_losses, static_argnums=1)(p, d_plain)
    l_fold = jax.jit(gan_losses, static_argnums=1)(p, d_fold)
    np.testing.assert_allclose(float(l_fold), float(l_plain),
                               rtol=2e-6, atol=2e-6)
    g_plain = jax.jit(jax.grad(gan_losses), static_argnums=1)(p, d_plain)
    g_fold = jax.jit(jax.grad(gan_losses), static_argnums=1)(p, d_fold)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=3e-6, rtol=2e-4),
        g_fold, g_plain)


@pytest.mark.slow
def test_discriminator_parity():
    from vits_decoder.mpd import MultiPeriodDiscriminator
    from vits_decoder.mrd import DiscriminatorR
    from vits_decoder.msd import ScaleDiscriminator as TMSD

    from whisper_vits_svc_tpu.models.discriminator import Discriminator

    _seed(5)
    hp = types.SimpleNamespace(
        mpd=types.SimpleNamespace(periods=[2, 3, 5, 7, 11], kernel_size=5, stride=3,
                                  use_spectral_norm=False, lReLU_slope=0.2),
        mrd=types.SimpleNamespace(resolutions="ignored", use_spectral_norm=False,
                                  lReLU_slope=0.2),
    )
    resolutions = [(1024, 120, 600), (2048, 240, 1200), (4096, 480, 2400), (512, 50, 240)]
    mrds = [DiscriminatorR(hp, r).eval() for r in resolutions]
    mpd = MultiPeriodDiscriminator(hp).eval()
    msd = TMSD().eval()

    rng = np.random.default_rng(11)
    audio = (rng.standard_normal((2, 1, 8000)) * 0.3).astype(np.float32)
    at = torch.from_numpy(audio)
    with torch.no_grad():
        ref_out = [d(at) for d in mrds] + list(mpd(at)) + list(msd(at))

    sd = {}
    for i, d in enumerate(mrds):
        sd.update({f"MRD.discriminators.{i}.{k}": v for k, v in d.state_dict().items()})
    sd.update({f"MPD.{k}": v for k, v in mpd.state_dict().items()})
    sd.update({f"MSD.{k}": v for k, v in msd.state_dict().items()})

    ours = Discriminator()
    x = audio.transpose(0, 2, 1)
    init = ours.init(jax.random.PRNGKey(0), x)["params"]
    merged = convert.merge_into(init, convert.discriminator(sd))
    out = ours.apply({"params": merged}, x)

    assert len(out) == len(ref_out) == 10
    for (fmap, score), (ref_fmap, ref_score) in zip(out, ref_out):
        np.testing.assert_allclose(
            np.asarray(score), ref_score.numpy().reshape(score.shape),
            rtol=2e-3, atol=2e-3,
        )
        assert len(fmap) == len(ref_fmap)


# ---------------------------------------------------------------- full infer graph


@pytest.mark.slow
def test_synthesizer_infer_parity():
    from vits import models as tmodels

    from whisper_vits_svc_tpu.models.synthesizer import SynthesizerInfer
    from whisper_vits_svc_tpu.nn.nsf import source_hn_nsf

    _seed(6)
    hp = _hp_gen()
    hp.vits = types.SimpleNamespace(
        ppg_dim=1280, vec_dim=256, spk_dim=256, gin_channels=256,
        inter_channels=192, hidden_channels=192, filter_channels=640,
    )
    ref = tmodels.SynthesizerInfer(513, 25, hp).eval()

    rng = np.random.default_rng(21)
    B, T = 1, 16
    ppg = rng.standard_normal((B, T, 1280)).astype(np.float32) * 0.3
    vec = rng.standard_normal((B, T, 256)).astype(np.float32) * 0.3
    pit = rng.uniform(100, 400, (B, T)).astype(np.float32)
    spk = rng.standard_normal((B, 256)).astype(np.float32) * 0.1
    lengths = np.array([T], np.int64)

    source = np.asarray(source_hn_nsf(pit, 320, 32000, rng=None))
    with mock.patch.object(torch, "randn_like", _zeros_like):
        with torch.no_grad():
            ref_y = ref.inference(
                torch.from_numpy(ppg), torch.from_numpy(vec), torch.from_numpy(pit),
                torch.from_numpy(spk), torch.from_numpy(lengths),
                torch.from_numpy(source.transpose(0, 2, 1)),
            ).numpy()

    ours = SynthesizerInfer()
    init = ours.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        ppg, vec, pit, spk, lengths, source,
    )["params"]
    merged = convert.merge_into(init, convert.synthesizer_infer(ref.state_dict()))
    y = ours.apply(
        {"params": merged}, ppg, vec, pit, spk, lengths, source, 0.0,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), ref_y, rtol=3e-3, atol=3e-3
    )


def test_banded_rel_attention_helpers():
    """Band<->dense conversions (nn/attention.py) vs a direct index
    construction, across boundary-heavy sizes (L near/below 2w)."""
    import numpy as np

    from whisper_vits_svc_tpu.nn.attention import (
        _absolute_to_band, _band_to_absolute,
    )

    rng = np.random.default_rng(3)
    for l, w in [(3, 1), (5, 4), (6, 4), (8, 4), (9, 4), (41, 4), (13, 2)]:
        w_eff = min(w, l - 1)
        n_rel = 2 * w_eff + 1
        band = rng.standard_normal((2, 2, l, n_rel)).astype(np.float32)
        dense = np.asarray(_band_to_absolute(jnp.asarray(band), w_eff))
        want = np.zeros((2, 2, l, l), np.float32)
        for i in range(l):
            for j in range(l):
                m = j - i
                if abs(m) <= w_eff:
                    want[..., i, j] = band[..., i, m + w_eff]
        np.testing.assert_allclose(dense, want, atol=0, rtol=0,
                                   err_msg=f"b2a l={l} w={w_eff}")

        x = rng.standard_normal((2, 2, l, l)).astype(np.float32)
        got = np.asarray(_absolute_to_band(jnp.asarray(x), w_eff))
        want_b = np.zeros((2, 2, l, n_rel), np.float32)
        for i in range(l):
            for c in range(n_rel):
                j = i + c - w_eff
                if 0 <= j < l:
                    want_b[..., i, c] = x[..., i, j]
        np.testing.assert_allclose(got, want_b, atol=0, rtol=0,
                                   err_msg=f"a2b l={l} w={w_eff}")


def test_msd_merge_groups_exact(rng):
    """Block-diagonal group merging (round-5 MXU-shaping of the MSD's
    4-channel groups) must leave values AND parameter gradients equal to
    the plain grouped execution — same params, same checkpoints."""
    from whisper_vits_svc_tpu.models.discriminator import ScaleDiscriminator

    x = jnp.asarray(rng.standard_normal((2, 512, 1)), jnp.float32) * 0.3
    plain = ScaleDiscriminator(merge_groups=False)
    merged = ScaleDiscriminator(merge_groups=True)
    p = plain.init(jax.random.PRNGKey(0), x)["params"]

    def loss(mod, p, x):
        fmap, score = mod.apply({"params": p}, x)
        return sum(jnp.sum(jnp.abs(f)) for f in fmap) + jnp.sum(
            jnp.square(score))

    v0, g0 = jax.value_and_grad(lambda p: loss(plain, p, x))(p)
    v1, g1 = jax.value_and_grad(lambda p: loss(merged, p, x))(p)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6),
        g0, g1)
