"""PyTorch checkpoint -> JAX params converter.

The reference publishes plain ``state_dict`` checkpoints (possibly with DDP
``module.`` prefixes, /root/reference/ccsmeth/call_modifications.py:342-358). This
module maps them onto our params pytrees. torch is only needed here (and only to
deserialize; tensors leave as numpy immediately).

Layout notes:
  - nn.Linear stores (out, in); ours is input-major (in, out) -> transpose.
  - nn.GRU/LSTM per layer/direction: weight_ih_l{k}[_reverse] (G*H, in) with torch
    gate order r,z,n (GRU) / i,f,g,o (LSTM) — our rnn.py uses the same order, so
    these pass through untransposed.
  - Conv1d (out, in, k) passes through (apply side handles layout).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from .config import AggrConfig, AttRNNConfig, TransEncConfig


def load_torch_state_dict(path: str) -> "OrderedDict[str, np.ndarray]":
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = OrderedDict()
    for k, v in sd.items():
        if k.startswith("module."):  # DDP-saved (train_multigpu.py:395-412)
            k = k[7:]
        out[k] = v.detach().cpu().numpy()
    return out


def _lin(sd, prefix, bias=True):
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    p["b"] = sd[prefix + ".bias"] if bias else np.zeros(p["w"].shape[1], np.float32)
    return p


def _rnn_layers(sd, prefix, num_layers):
    layers = []
    for k in range(num_layers):
        ld = {}
        for d, suf in (("fwd", ""), ("bwd", "_reverse")):
            ld[d] = {
                "w_ih": sd["{}.weight_ih_l{}{}".format(prefix, k, suf)],
                "w_hh": sd["{}.weight_hh_l{}{}".format(prefix, k, suf)],
                "b_ih": sd["{}.bias_ih_l{}{}".format(prefix, k, suf)],
                "b_hh": sd["{}.bias_hh_l{}{}".format(prefix, k, suf)],
            }
        layers.append(ld)
    return layers


def _attention(sd, prefix="_att3"):
    return {
        "Wa": np.ascontiguousarray(sd[prefix + ".Wa.weight"].T),
        "Ua": np.ascontiguousarray(sd[prefix + ".Ua.weight"].T),
        "va": np.ascontiguousarray(sd[prefix + ".va.weight"].T),
    }


def _bn(sd, prefix):
    return {
        "scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"],
        "mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"],
    }


def _src_embed(sd, prefix, block_plus):
    p = {
        "conv1": sd[prefix + ".conv_embed.0.weight"],
        "bn1": _bn(sd, prefix + ".conv_embed.1"),
        "conv2": sd[prefix + ".conv_embed.4.weight"],
        "bn2": _bn(sd, prefix + ".conv_embed.5"),
        "plus": [],
    }
    for i in range(block_plus):
        bp = "{}.conv_embed_plus.{}.conv_embed".format(prefix, i)
        p["plus"].append({"conv": sd[bp + ".0.weight"], "bn": _bn(sd, bp + ".1")})
    return p


def _attrnn_from_sd(sd, cfg: AttRNNConfig) -> dict:
    params: dict = {}
    if cfg.embedded_kinetics:
        params["seq_embed"] = sd["seq_embed.weight"]
        params["ipd_embed"] = sd["ipd_embed.weight"]
        params["pw_embed"] = sd["pw_embed.weight"]
        if cfg.is_stds:
            params["ipd_std_embed"] = _src_embed(sd, "ipd_std_embed", 1)
            params["pw_std_embed"] = _src_embed(sd, "pw_std_embed", 1)
        if cfg.is_npass:
            params["npass_embed"] = sd["npass_embed.weight"]
        if cfg.is_sn:
            params["sn_embed"] = _src_embed(sd, "sn_embed", 0)
        if cfg.is_map:
            params["map_embed"] = sd["map_embed.weight"]
        params["classifier"] = [_lin(sd, "classifier.0"), _lin(sd, "classifier.3")]
    else:
        params["embed"] = sd["embed.weight"]
        params["fc1"] = _lin(sd, "fc1")
    params["rnn"] = _rnn_layers(sd, "rnn", cfg.num_layers)
    params["att"] = _attention(sd)
    return params


def _aggr_from_sd(sd, cfg: AggrConfig) -> dict:
    return {
        "rnn": _rnn_layers(sd, "rnn", cfg.num_layers),
        "att": _attention(sd),
        "fc1": _lin(sd, "fc1"),
    }


def _transenc_from_sd(sd, cfg: TransEncConfig) -> dict:
    params: dict = {
        "seq_embed": sd["seq_embed.weight"],
        "ipd_embed": sd["ipd_embed.weight"],
        "pw_embed": sd["pw_embed.weight"],
        "trans_input": _src_embed(sd, "trans_input", 1),
        "pos_embed": sd["pos_encoder.pos_embed.weight"],
        "classifier": [_lin(sd, "classifier.0"), _lin(sd, "classifier.3")],
        "layers": [],
    }
    if cfg.is_npass:
        params["npass_embed"] = sd["npass_embed.weight"]
    if cfg.is_stds:
        params["ipd_std_embed"] = _src_embed(sd, "ipd_std_embed", 1)
        params["pw_std_embed"] = _src_embed(sd, "pw_std_embed", 1)
    if cfg.is_sn:
        params["sn_embed"] = _src_embed(sd, "sn_embed", 0)
    if cfg.is_map:
        params["map_embed"] = sd["map_embed.weight"]
    for i in range(cfg.num_layers):
        p = "transformer_encoder.layers.{}".format(i)
        d = cfg.d_model
        in_w = sd[p + ".self_attn.in_proj_weight"]  # (3d, d)
        in_b = sd[p + ".self_attn.in_proj_bias"]
        params["layers"].append({
            "wq": np.ascontiguousarray(in_w[:d].T), "bq": in_b[:d],
            "wk": np.ascontiguousarray(in_w[d : 2 * d].T), "bk": in_b[d : 2 * d],
            "wv": np.ascontiguousarray(in_w[2 * d :].T), "bv": in_b[2 * d :],
            "wo": np.ascontiguousarray(sd[p + ".self_attn.out_proj.weight"].T),
            "bo": sd[p + ".self_attn.out_proj.bias"],
            "lin1": _lin(sd, p + ".linear1"),
            "lin2": _lin(sd, p + ".linear2"),
            "ln1": {"scale": sd[p + ".norm1.weight"], "bias": sd[p + ".norm1.bias"]},
            "ln2": {"scale": sd[p + ".norm2.weight"], "bias": sd[p + ".norm2.bias"]},
        })
    return params


def torch_ckpt_to_params(path: str, cfg) -> dict:
    """Convert a reference .ckpt to this engine's params pytree (numpy leaves)."""
    sd = load_torch_state_dict(path)
    if isinstance(cfg, AggrConfig):
        return _aggr_from_sd(sd, cfg)
    if isinstance(cfg, TransEncConfig):
        return _transenc_from_sd(sd, cfg)
    if isinstance(cfg, AttRNNConfig):
        return _attrnn_from_sd(sd, cfg)
    raise TypeError("unknown config type {}".format(type(cfg)))
