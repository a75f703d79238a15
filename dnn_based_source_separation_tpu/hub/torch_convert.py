"""torch state_dict -> flax params conversion.

Layer-level adapters encode the transpose conventions once (verified
against torch in tests/test_hub.py); model-level converters map the
reference's parameter names onto this framework's module tree.

Shapes (torch -> ours):
  Conv1d k=1            (out, in, 1)   -> Dense kernel (in, out)
  Conv1d k>1 (NWC)      (out, in, k)   -> nn.Conv kernel (k, in, out)
  depthwise Conv1d      (C, 1, k)      -> nn.Conv kernel (k, 1, C)
  ConvTranspose1d       (in, out, k)   -> frame+matmul decoder (in, out*k)
  encoder Conv1d        (N, C, L)      -> frame+matmul encoder (C*L, N)
  LSTM weight_ih_l*     (4H, F)        -> w_ih (F, 4H); b = b_ih + b_hh
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t):
    """Accept torch tensors or numpy arrays."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def dense_weight(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return _np(w).T


def conv1d_weight(w) -> np.ndarray:
    """torch Conv1d weight (out, in, k) -> flax nn.Conv kernel (k, in, out)."""
    return np.transpose(_np(w), (2, 1, 0))


def depthwise_conv1d_weight(w) -> np.ndarray:
    """torch depthwise Conv1d (C, 1, k) -> flax kernel (k, 1, C)."""
    return np.transpose(_np(w), (2, 1, 0))


def conv2d_weight(w) -> np.ndarray:
    """torch Conv2d weight (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(_np(w), (2, 3, 1, 0))


def conv_transpose1d_weight(w) -> np.ndarray:
    """torch ConvTranspose1d (in=N, out=C, k=L) -> decoder matmul (N, C*L)."""
    w = _np(w)  # (N, C, L)
    N, C, L = w.shape
    return w.reshape(N, C * L)


def encoder_conv1d_weight(w) -> np.ndarray:
    """torch Conv1d encoder (N, C, L) -> frame+matmul encoder (C*L, N)."""
    w = _np(w)
    N = w.shape[0]
    return w.reshape(N, -1).T


def lstm_params(state_dict: Mapping, prefix: str, num_layers: int = 1, bidirectional: bool = True) -> Dict:
    """torch nn.LSTM params under `prefix` -> ops.rnn.LSTM param dict."""
    out = {}
    dot = f"{prefix}." if prefix else ""
    for layer in range(num_layers):
        for direction in ([0, 1] if bidirectional else [0]):
            t_sfx = f"_l{layer}" + ("_reverse" if direction else "")
            w_ih = _np(state_dict[f"{dot}weight_ih{t_sfx}"])
            w_hh = _np(state_dict[f"{dot}weight_hh{t_sfx}"])
            b = _np(state_dict[f"{dot}bias_ih{t_sfx}"]) + _np(state_dict[f"{dot}bias_hh{t_sfx}"])
            out[f"w_ih{t_sfx}"] = w_ih.T
            out[f"w_hh{t_sfx}"] = w_hh.T
            out[f"b{t_sfx}"] = b
    return out


def _norm_params(state_dict: Mapping, prefix: str) -> Dict:
    """gLN/cLN gamma/beta (1, N, 1) -> (N,)."""
    return {
        "gamma": _np(state_dict[f"{prefix}.gamma"]).reshape(-1),
        "beta": _np(state_dict[f"{prefix}.beta"]).reshape(-1),
    }


def _dense_params(state_dict: Mapping, prefix: str, conv: bool = True) -> Dict:
    """1x1 Conv1d or Linear -> Dense {kernel, bias}."""
    w = _np(state_dict[f"{prefix}.weight"])
    if conv:
        w = w[..., 0]  # (out, in, 1) -> (out, in)
    out = {"kernel": w.T}
    if f"{prefix}.bias" in state_dict:
        out["bias"] = _np(state_dict[f"{prefix}.bias"])
    return out


def convert_conv_tasnet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference ConvTasNet state_dict -> flax params tree.

    Supports enc_basis='trainable', dec_basis='trainable' (the headline
    wsj0-mix configuration, reference conv_tasnet.py:57-114).
    """
    p: Dict = {}

    p["encoder"] = {"kernel": encoder_conv1d_weight(state_dict["encoder.conv1d.weight"])}
    p["decoder"] = {"kernel": conv_transpose1d_weight(state_dict["decoder.conv_transpose1d.weight"])}

    num_blocks = int(config.get("sep_num_blocks", 3))
    num_layers = int(config.get("sep_num_layers", 8))
    causal = bool(config.get("causal", False))
    # Unnamed flax submodules are auto-named by class.
    norm_cls = "CumulativeLayerNorm_0" if causal else "GlobalLayerNorm_0"

    sep: Dict = {}
    sep[norm_cls] = _norm_params(state_dict, "separator.norm1d")
    sep["bottleneck_conv1d"] = _dense_params(state_dict, "separator.bottleneck_conv1d")
    sep["prelu"] = {"alpha": _np(state_dict["separator.prelu.weight"]).reshape(())}
    sep["mask_conv1d"] = _dense_params(state_dict, "separator.mask_conv1d")

    tdcn: Dict = {}
    for r in range(num_blocks):
        block: Dict = {}
        for x in range(num_layers):
            ref = f"separator.tdcn.net.{r}.net.{x}"
            layer: Dict = {}
            layer["bottleneck_conv1d"] = _dense_params(state_dict, f"{ref}.bottleneck_conv1d")
            layer["nonlinear1d"] = {"alpha": _np(state_dict[f"{ref}.nonlinear1d.weight"]).reshape(())}
            layer[norm_cls] = _norm_params(state_dict, f"{ref}.norm1d")
            sc = f"{ref}.separable_conv1d"
            sep_conv: Dict = {
                "depthwise_conv1d": {
                    "kernel": depthwise_conv1d_weight(state_dict[f"{sc}.depthwise_conv1d.weight"]),
                    "bias": _np(state_dict[f"{sc}.depthwise_conv1d.bias"]),
                },
                "nonlinear1d": {"alpha": _np(state_dict[f"{sc}.nonlinear1d.weight"]).reshape(())},
                norm_cls: _norm_params(state_dict, f"{sc}.norm1d"),
                "skip_pointwise_conv1d": _dense_params(state_dict, f"{sc}.skip_pointwise_conv1d"),
            }
            if f"{sc}.output_pointwise_conv1d.weight" in state_dict:
                sep_conv["output_pointwise_conv1d"] = _dense_params(state_dict, f"{sc}.output_pointwise_conv1d")
            layer["separable_conv1d"] = sep_conv
            block[f"layer{x}"] = layer
        tdcn[f"block{r}"] = block
    sep["tdcn"] = tdcn
    p["separator"] = sep
    return {"params": p}


def build_from_torch_checkpoint(checkpoint_path: str):
    """Load a reference .pth checkpoint (config-in-checkpoint) and return
    (model, params). Requires torch for deserialization."""
    import torch

    from ..models import ConvTasNet

    blob = torch.load(checkpoint_path, map_location="cpu")
    config = {k: v for k, v in blob.items() if k not in ("state_dict", "optim_dict")}
    state_dict = blob["state_dict"]

    model = ConvTasNet(
        n_basis=config["n_basis"], kernel_size=config["kernel_size"],
        stride=config.get("stride"), enc_basis=config.get("enc_basis", "trainable"),
        dec_basis=config.get("dec_basis", "trainable"),
        enc_nonlinear=config.get("enc_nonlinear"),
        sep_hidden_channels=config.get("sep_hidden_channels", 256),
        sep_bottleneck_channels=config.get("sep_bottleneck_channels", 128),
        sep_skip_channels=config.get("sep_skip_channels", 128),
        sep_kernel_size=config.get("sep_kernel_size", 3),
        sep_num_blocks=config.get("sep_num_blocks", 3),
        sep_num_layers=config.get("sep_num_layers", 8),
        dilated=config.get("dilated", True), separable=config.get("separable", True),
        sep_nonlinear=config.get("sep_nonlinear", "prelu"),
        sep_norm=config.get("sep_norm", True),
        mask_nonlinear=config.get("mask_nonlinear", "sigmoid"),
        causal=config.get("causal", False), n_sources=config.get("n_sources", 2),
    )
    params = convert_conv_tasnet(state_dict, config)
    return model, params


def convert_dprnn_tasnet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference DPRNNTasNet state_dict -> flax params tree.

    Reference module paths (src/models/dprnn_tasnet.py): encoder.conv1d,
    decoder.conv_transpose1d, separator.{norm1d,bottleneck_conv1d,prelu,
    mask_conv1d} and separator.dprnn.net.{i}.{intra,inter}_chunk_block with
    rnn + fc + norm1d inside each direction block (src/models/dprnn.py).
    """
    causal = bool(config.get("causal", False))
    num_blocks = int(config.get("sep_num_blocks", 6))
    top_norm = "CumulativeLayerNorm_0" if causal else "GlobalLayerNorm_0"

    p: Dict = {}
    p["encoder"] = {"kernel": encoder_conv1d_weight(state_dict["encoder.conv1d.weight"])}
    p["decoder"] = {"kernel": conv_transpose1d_weight(state_dict["decoder.conv_transpose1d.weight"])}

    sep: Dict = {}
    sep[top_norm] = _norm_params(state_dict, "separator.norm1d")
    sep["bottleneck_conv1d"] = _dense_params(state_dict, "separator.bottleneck_conv1d")
    sep["prelu"] = {"alpha": _np(state_dict["separator.prelu.weight"]).reshape(())}
    sep["mask_conv1d"] = _dense_params(state_dict, "separator.mask_conv1d")

    dprnn: Dict = {}
    for i in range(num_blocks):
        ref = f"separator.dprnn.net.{i}"
        intra: Dict = {}
        intra["rnn"] = lstm_params(state_dict, f"{ref}.intra_chunk_block.rnn",
                                   bidirectional=True)
        intra["fc"] = {
            "kernel": dense_weight(state_dict[f"{ref}.intra_chunk_block.fc.weight"]),
            "bias": _np(state_dict[f"{ref}.intra_chunk_block.fc.bias"]),
        }
        intra["GlobalLayerNorm_0"] = _norm_params(state_dict, f"{ref}.intra_chunk_block.norm1d")

        inter: Dict = {}
        inter["rnn"] = lstm_params(state_dict, f"{ref}.inter_chunk_block.rnn",
                                   bidirectional=not causal)
        inter["fc"] = {
            "kernel": dense_weight(state_dict[f"{ref}.inter_chunk_block.fc.weight"]),
            "bias": _np(state_dict[f"{ref}.inter_chunk_block.fc.bias"]),
        }
        inter[top_norm] = _norm_params(state_dict, f"{ref}.inter_chunk_block.norm1d")

        dprnn[f"block{i}"] = {"intra_chunk_block": intra, "inter_chunk_block": inter}
    sep["dprnn"] = dprnn
    p["separator"] = sep
    return {"params": p}


def _transform_block_params(state_dict: Mapping, prefix: str):
    """Reference TransformBlock1d (fc + BatchNorm1d, umx.py:533) ->
    (params dict, batch_stats dict) for our umx.TransformBlock1d."""
    params = {
        "linear": {"kernel": dense_weight(state_dict[f"{prefix}.fc.weight"])},
        "norm": {
            "scale": _np(state_dict[f"{prefix}.norm1d.weight"]),
            "bias": _np(state_dict[f"{prefix}.norm1d.bias"]),
        },
    }
    if f"{prefix}.fc.bias" in state_dict:
        params["linear"]["bias"] = _np(state_dict[f"{prefix}.fc.bias"])
    stats = {
        "norm": {
            "mean": _np(state_dict[f"{prefix}.norm1d.running_mean"]),
            "var": _np(state_dict[f"{prefix}.norm1d.running_var"]),
        }
    }
    return params, stats


def convert_open_unmix(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference OpenUnmix state_dict -> flax variables (params + batch_stats).

    Reference module paths (src/models/umx.py:212-356): block (input
    TransformBlock1d), rnn (nn.LSTM, 'net.0'/'net.1' output blocks),
    scale_in/bias_in/scale_out/bias_out per-bin affines.
    """
    causal = bool(config.get("causal", False))
    num_layers = int(config.get("num_layers", 3))

    params: Dict = {}
    stats: Dict = {}

    params["scale_in"] = _np(state_dict["scale_in"])
    params["bias_in"] = _np(state_dict["bias_in"])
    params["scale_out"] = _np(state_dict["scale_out"])
    params["bias_out"] = _np(state_dict["bias_out"])

    for ours, ref in (("block", "block"), ("net0", "net.0"), ("net1", "net.1")):
        p, s = _transform_block_params(state_dict, ref)
        params[ours] = p
        stats[ours] = s

    params["rnn"] = lstm_params(state_dict, "rnn", num_layers=num_layers,
                                bidirectional=not causal)
    return {"params": params, "batch_stats": stats}


def _transformer_layer_params(state_dict: Mapping, prefix: str) -> Dict:
    """torch nn.TransformerEncoderLayer -> ops.attention.TransformerEncoderLayer."""
    E = _np(state_dict[f"{prefix}.self_attn.in_proj_weight"]).shape[1]
    return {
        "self_attn": {
            "in_proj": {
                "kernel": dense_weight(state_dict[f"{prefix}.self_attn.in_proj_weight"]),
                "bias": _np(state_dict[f"{prefix}.self_attn.in_proj_bias"]),
            },
            "out_proj": {
                "kernel": dense_weight(state_dict[f"{prefix}.self_attn.out_proj.weight"]),
                "bias": _np(state_dict[f"{prefix}.self_attn.out_proj.bias"]),
            },
        },
        "linear1": {
            "kernel": dense_weight(state_dict[f"{prefix}.linear1.weight"]),
            "bias": _np(state_dict[f"{prefix}.linear1.bias"]),
        },
        "linear2": {
            "kernel": dense_weight(state_dict[f"{prefix}.linear2.weight"]),
            "bias": _np(state_dict[f"{prefix}.linear2.bias"]),
        },
        "norm1": {
            "scale": _np(state_dict[f"{prefix}.norm1.weight"]),
            "bias": _np(state_dict[f"{prefix}.norm1.bias"]),
        },
        "norm2": {
            "scale": _np(state_dict[f"{prefix}.norm2.weight"]),
            "bias": _np(state_dict[f"{prefix}.norm2.bias"]),
        },
    }


def convert_sepformer(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference SepFormer state_dict -> flax params tree.

    Reference paths (src/models/sepformer.py): encoder.conv1d,
    decoder.conv_transpose1d, separator.{norm1d,bottleneck_conv1d_in,prelu,
    map,gtu,bottleneck_conv1d_out} and
    separator.dptransformer.net.{b}.{intra,inter}_transformer.transformer.layers.{l}
    plus the stack's final gLN (transformer.norm).
    """
    causal = bool(config.get("causal", False))
    num_blocks = int(config.get("sep_num_blocks", 2))
    nli = int(config.get("sep_num_layers_intra", config.get("sep_num_layers", 8)))
    nle = int(config.get("sep_num_layers_inter", config.get("sep_num_layers", 8)))
    top_norm = "CumulativeLayerNorm_0" if causal else "GlobalLayerNorm_0"

    p: Dict = {}
    p["encoder"] = {"kernel": encoder_conv1d_weight(state_dict["encoder.conv1d.weight"])}
    p["decoder"] = {"kernel": conv_transpose1d_weight(state_dict["decoder.conv_transpose1d.weight"])}

    sep: Dict = {}
    sep[top_norm] = _norm_params(state_dict, "separator.norm1d")
    sep["bottleneck_conv1d_in"] = _dense_params(state_dict, "separator.bottleneck_conv1d_in")
    sep["prelu"] = {"alpha": _np(state_dict["separator.prelu.weight"]).reshape(())}
    sep["map"] = _dense_params(state_dict, "separator.map")
    sep["gtu_tanh"] = _dense_params(state_dict, "separator.gtu.map")
    sep["gtu_sigmoid"] = _dense_params(state_dict, "separator.gtu.map_gate")
    sep["bottleneck_conv1d_out"] = _dense_params(state_dict, "separator.bottleneck_conv1d_out")

    for b in range(num_blocks):
        blk: Dict = {}
        for path, n_layers in (("intra_transformer", nli), ("inter_transformer", nle)):
            ref = f"separator.dptransformer.net.{b}.{path}.transformer"
            sub: Dict = {}
            for l in range(n_layers):
                sub[f"layer{l}"] = _transformer_layer_params(state_dict, f"{ref}.layers.{l}")
            sub["GlobalLayerNorm_0"] = _norm_params(state_dict, f"{ref}.norm.norm1d")
            blk[path] = sub
        sep[f"block{b}"] = blk
    p["separator"] = sep
    return {"params": p}
