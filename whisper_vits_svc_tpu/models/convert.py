"""PyTorch-checkpoint -> JAX-pytree converters.

The reference checkpoints (`sovits5.0.pretrain.pth` et al., format
vits_extend/train.py:268-276: {model_g, model_d, optim_*, step, epoch,
hp_str}) are the source of truth for numerical parity. These converters map
torch state_dict tensors into the flax param trees of our models, handling:

  * conv layout:   torch Conv1d (O, I, K)        -> ours (K, I, O)
  *                torch ConvTranspose1d (I, O, K)-> ours (K, I, O)
  *                torch Conv2d (O, I, Kh, Kw)   -> ours (Kh, Kw, I, O)
  * weight norm:   torch weight_g/weight_v pairs -> our g/v params
  * 1x1 convs:     folded to Dense kernels (I, O) where the module is Dense
  * LayerNorm:     gamma/beta -> scale/bias

Missing-key tolerance mirrors the reference loaders (svc_inference.py:61-74,
vits_extend/train.py:43-59): absent keys keep their current (init) values.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _j(prefix: str, key: str) -> str:
    return key if not prefix else f"{prefix}.{key}"


def conv1d(sd: Mapping, name: str) -> dict:
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def wn_conv1d(sd: Mapping, name: str) -> dict:
    out = {
        "v": _np(sd[f"{name}.weight_v"]).transpose(2, 1, 0),
        "g": _np(sd[f"{name}.weight_g"]).reshape(1, 1, -1),
    }
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def wn_convT1d(sd: Mapping, name: str) -> dict:
    v = _np(sd[f"{name}.weight_v"])  # (I, O, K)
    g = _np(sd[f"{name}.weight_g"])  # (I, 1, 1)
    out = {
        "v": v.transpose(2, 0, 1),                 # (K, I, O)
        "g": g.reshape(1, -1, 1),                  # (1, I, 1)
    }
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def wn_conv2d(sd: Mapping, name: str) -> dict:
    out = {
        "v": _np(sd[f"{name}.weight_v"]).transpose(2, 3, 1, 0),
        "g": _np(sd[f"{name}.weight_g"]).reshape(1, 1, 1, -1),
    }
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def dense(sd: Mapping, name: str) -> dict:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def dense_from_conv1x1(sd: Mapping, name: str) -> dict:
    out = {"kernel": _np(sd[f"{name}.weight"])[:, :, 0].T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def layer_norm(sd: Mapping, name: str) -> dict:
    return {"scale": _np(sd[f"{name}.gamma"]), "bias": _np(sd[f"{name}.beta"])}


def wn_params(sd: Mapping, name: str, n_layers: int, has_cond: bool) -> dict:
    p = {}
    if has_cond and _j(name, "cond_layer.weight_v") in sd:
        p["cond_layer"] = wn_conv1d(sd, _j(name, "cond_layer"))
    for i in range(n_layers):
        p[f"in_layers_{i}"] = wn_conv1d(sd, _j(name, f"in_layers.{i}"))
        p[f"res_skip_layers_{i}"] = wn_conv1d(sd, _j(name, f"res_skip_layers.{i}"))
    return p


def rel_pos_transformer(sd: Mapping, name: str, n_layers: int) -> dict:
    p = {}
    for i in range(n_layers):
        attn = {
            "conv_q": dense_from_conv1x1(sd, _j(name, f"attn_layers.{i}.conv_q")),
            "conv_k": dense_from_conv1x1(sd, _j(name, f"attn_layers.{i}.conv_k")),
            "conv_v": dense_from_conv1x1(sd, _j(name, f"attn_layers.{i}.conv_v")),
            "conv_o": dense_from_conv1x1(sd, _j(name, f"attn_layers.{i}.conv_o")),
            "emb_rel_k": _np(sd[_j(name, f"attn_layers.{i}.emb_rel_k")]),
            "emb_rel_v": _np(sd[_j(name, f"attn_layers.{i}.emb_rel_v")]),
        }
        p[f"attn_layers_{i}"] = attn
        p[f"norm_layers_1_{i}"] = layer_norm(sd, _j(name, f"norm_layers_1.{i}"))
        p[f"ffn_layers_{i}"] = {
            "conv_1": conv1d(sd, _j(name, f"ffn_layers.{i}.conv_1")),
            "conv_2": conv1d(sd, _j(name, f"ffn_layers.{i}.conv_2")),
        }
        p[f"norm_layers_2_{i}"] = layer_norm(sd, _j(name, f"norm_layers_2.{i}"))
    return p


def text_encoder(sd: Mapping, name: str = "enc_p") -> dict:
    return {
        "pre": conv1d(sd, f"{name}.pre"),
        "hub": conv1d(sd, f"{name}.hub"),
        "pit": {"embedding": _np(sd[f"{name}.pit.weight"])},
        "enc": rel_pos_transformer(sd, f"{name}.enc", 6),
        "proj": conv1d(sd, f"{name}.proj"),
    }


def posterior_encoder(sd: Mapping, name: str = "enc_q") -> dict:
    return {
        "pre": conv1d(sd, f"{name}.pre"),
        "enc": wn_params(sd, f"{name}.enc", 16, has_cond=True),
        "proj": conv1d(sd, f"{name}.proj"),
    }


def coupling_block(sd: Mapping, name: str = "flow", n_flows: int = 4) -> dict:
    p = {}
    for i in range(n_flows):
        # torch interleaves Flip modules: couplings at even indices
        t = f"{name}.flows.{2 * i}"
        p[f"flows_{i}"] = {
            "pre": conv1d(sd, f"{t}.pre"),
            "enc": wn_params(sd, f"{t}.enc", 4, has_cond=False),
            "post": conv1d(sd, f"{t}.post"),
            "snac": conv1d(sd, f"{t}.snac"),
        }
    return p


def _count_generator_dims(sd: Mapping, name: str) -> tuple[int, int]:
    """Infer (n_ups, n_kernels) from the state-dict keys."""
    import re as _re

    ups = {int(m.group(1)) for k in sd
           if (m := _re.match(rf"{_re.escape(name)}\.?ups\.(\d+)\.", k))}
    res = {int(m.group(1)) for k in sd
           if (m := _re.match(rf"{_re.escape(name)}\.?resblocks\.(\d+)\.", k))}
    n_ups = (max(ups) + 1) if ups else 5
    n_res = (max(res) + 1) if res else 15
    return n_ups, max(n_res // n_ups, 1)


def generator(sd: Mapping, name: str = "dec", *, n_ups: int | None = None,
              n_kernels: int | None = None) -> dict:
    if n_ups is None or n_kernels is None:
        n_ups, n_kernels = _count_generator_dims(sd, name)
    p = {
        "adapter": {
            "w_scale_kernel": _np(sd[_j(name, "adapter.W_scale.weight")]).T,
            "w_scale_bias": _np(sd[_j(name, "adapter.W_scale.bias")]),
            "w_bias_kernel": _np(sd[_j(name, "adapter.W_bias.weight")]).T,
            "w_bias_bias": _np(sd[_j(name, "adapter.W_bias.bias")]),
        },
        "conv_pre": conv1d(sd, _j(name, "conv_pre")),
        "conv_post": conv1d(sd, _j(name, "conv_post")),
    }
    for i in range(n_ups):
        p[f"ups_{i}"] = wn_convT1d(sd, _j(name, f"ups.{i}"))
        p[f"noise_convs_{i}"] = conv1d(sd, _j(name, f"noise_convs.{i}"))
    for r in range(n_ups * n_kernels):
        rb = {}
        for j in range(3):
            rb[f"convs1_{j}"] = wn_conv1d(sd, _j(name, f"resblocks.{r}.convs1.{j}"))
            rb[f"convs2_{j}"] = wn_conv1d(sd, _j(name, f"resblocks.{r}.convs2.{j}"))
            # activations[::2] -> act1, activations[1::2] -> act2 (bigv.py:51)
            rb[f"act1_{j}"] = {"act": {
                "alpha": _np(sd[_j(name, f"resblocks.{r}.activations.{2 * j}.act.alpha")]),
                "beta": _np(sd[_j(name, f"resblocks.{r}.activations.{2 * j}.act.beta")]),
            }}
            rb[f"act2_{j}"] = {"act": {
                "alpha": _np(sd[_j(name, f"resblocks.{r}.activations.{2 * j + 1}.act.alpha")]),
                "beta": _np(sd[_j(name, f"resblocks.{r}.activations.{2 * j + 1}.act.beta")]),
            }}
        p[f"resblocks_{r}"] = rb
    p["activation_post"] = {"act": {
        "alpha": _np(sd[_j(name, "activation_post.act.alpha")]),
        "beta": _np(sd[_j(name, "activation_post.act.beta")]),
    }}
    return p


def speaker_classifier(sd: Mapping, name: str = "speaker_classifier") -> dict:
    # reference nn.Sequential: [GRL, conv, ReLU, conv, ReLU, conv] -> 1, 3, 5
    return {
        "conv_0": wn_conv1d(sd, f"{name}.classifier.1"),
        "conv_1": wn_conv1d(sd, f"{name}.classifier.3"),
        "conv_2": wn_conv1d(sd, f"{name}.classifier.5"),
    }


def synthesizer_infer(sd: Mapping) -> dict:
    """model_g state_dict -> SynthesizerInfer params (enc_q/classifier absent)."""
    return {
        "enc_p": text_encoder(sd),
        "flow": coupling_block(sd),
        "dec": generator(sd),
    }


def synthesizer_trn(sd: Mapping) -> dict:
    return {
        "emb_g": dense(sd, "emb_g"),
        "enc_p": text_encoder(sd),
        "speaker_classifier": speaker_classifier(sd),
        "enc_q": posterior_encoder(sd),
        "flow": coupling_block(sd),
        "dec": generator(sd),
    }


def discriminator(sd: Mapping) -> dict:
    import re as _re

    def count(prefix):
        found = {int(m.group(1)) for k in sd
                 if (m := _re.match(rf"{prefix}\.discriminators\.(\d+)\.", k))}
        return (max(found) + 1) if found else 0

    p = {}
    for i in range(count("MRD")):
        d = {}
        for j in range(5):
            d[f"convs_{j}"] = wn_conv2d(sd, f"MRD.discriminators.{i}.convs.{j}")
        d["conv_post"] = wn_conv2d(sd, f"MRD.discriminators.{i}.conv_post")
        p[f"mrd_{i}"] = d
    for i in range(count("MPD")):
        d = {}
        for j in range(5):
            d[f"convs_{j}"] = wn_conv2d(sd, f"MPD.discriminators.{i}.convs.{j}")
        d["conv_post"] = wn_conv2d(sd, f"MPD.discriminators.{i}.conv_post")
        p[f"mpd_{i}"] = d
    d = {}
    for j in range(6):
        d[f"convs_{j}"] = wn_conv1d(sd, f"MSD.convs.{j}")
    d["conv_post"] = wn_conv1d(sd, "MSD.conv_post")
    p["msd"] = d
    return p


def merge_into(init_params: dict, converted: dict, path: str = "") -> dict:
    """Overlay converted tensors onto an init pytree, asserting shape match.

    Keys missing from `converted` keep their init values (missing-key
    tolerance of the reference loaders).
    """
    out = {}
    for k, v in init_params.items():
        if k not in converted:
            out[k] = v
            continue
        c = converted[k]
        if isinstance(v, dict):
            out[k] = merge_into(v, c, f"{path}/{k}")
        else:
            assert tuple(np.shape(c)) == tuple(np.shape(v)), (
                f"shape mismatch at {path}/{k}: ckpt {np.shape(c)} vs init {np.shape(v)}"
            )
            out[k] = np.asarray(c, dtype=np.asarray(v).dtype)
    return out
