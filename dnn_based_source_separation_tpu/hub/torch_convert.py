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
    """TasNet norm params -> {gamma, beta} (N,).

    The reference has two layouts (src/modules/norm.py): GlobalLayerNorm
    wraps nn.GroupNorm(1, C) so its params are `{prefix}.norm.weight/bias`;
    CumulativeLayerNorm1d owns `{prefix}.gamma/beta` of shape (1, C, 1).
    """
    if f"{prefix}.norm.weight" in state_dict:
        return {
            "gamma": _np(state_dict[f"{prefix}.norm.weight"]).reshape(-1),
            "beta": _np(state_dict[f"{prefix}.norm.bias"]).reshape(-1),
        }
    return _gamma_beta_params(state_dict, prefix)


def _gamma_beta_params(state_dict: Mapping, prefix: str) -> Dict:
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
    (model, params). Requires torch for deserialization.

    The reference checkpoint stores only the config dict + state_dict
    (driver.py:208-226), so the architecture is inferred from distinctive
    config keys: sep_chunk_size -> DPRNN-TasNet, sep_num_layers_intra ->
    SepFormer, n_bins -> Open-Unmix, otherwise Conv-TasNet.
    """
    import torch

    from ..models import ConvTasNet, DPRNNTasNet, OpenUnmix, SepFormer

    blob = torch.load(checkpoint_path, map_location="cpu")
    config = {k: v for k, v in blob.items() if k not in ("state_dict", "optim_dict")}
    state_dict = blob["state_dict"]

    if "bands" in config or any(k.startswith("net.full.") for k in state_dict):
        # Band-structured family: D3Net (d3block keys), MMDenseRNN/LSTM
        # (hidden_channels config), or plain MMDenseNet.
        band_common = dict(
            in_channels=config["in_channels"],
            num_features=config["num_features"],
            growth_rate=config["growth_rate"],
            kernel_size=config.get("kernel_size", 3),
            bands=list(config["bands"]),
            sections=config["sections"],
            scale=config.get("scale", 2),
            depth=config.get("depth"),
            growth_rate_final=config.get("growth_rate_final"),
            kernel_size_final=config.get("kernel_size_final", 3),
            depth_final=config.get("depth_final"),
            norm_final=config.get("norm_final", True),
            nonlinear_final=config.get("nonlinear_final", "relu"),
        )
        if any("d3block" in k for k in state_dict):
            from ..models.d3net import D3Net

            model = D3Net(
                num_d2blocks=config.get("num_d2blocks"),
                dilated=config.get("dilated", True),
                norm=config.get("norm", True),
                nonlinear=config.get("nonlinear", "relu"),
                dilated_final=config.get("dilated_final", True),
                **band_common,
            )
            return model, convert_d3net(state_dict, config)

        band_common.update(
            dilated=config.get("dilated", False),
            norm=config.get("norm", True),
            nonlinear=config.get("nonlinear", "relu"),
            dilated_final=config.get("dilated_final", False),
        )
        if "hidden_channels" in config:
            from ..models.mm_dense_rnn import MMDenseLSTM, MMDenseRNN

            rnn_type = config.get("rnn_type", "lstm")
            cls = MMDenseLSTM if rnn_type == "lstm" else MMDenseRNN
            kwargs = dict(
                hidden_channels=config["hidden_channels"],
                hidden_channels_final=int(config.get("hidden_channels_final") or 0),
                causal=config.get("causal", False),
                rnn_position=config.get("rnn_position", "parallel"),
                **band_common,
            )
            if cls is MMDenseRNN:
                kwargs["rnn_type"] = rnn_type
            model = cls(**kwargs)
            return model, convert_mm_dense_rnn(state_dict, config)

        from ..models.mm_densenet import MMDenseNet

        model = MMDenseNet(**band_common)
        return model, convert_mm_densenet(state_dict, config)

    if any(k.startswith("backbone.") for k in state_dict):
        from ..models.xumx import CrossNetOpenUnmix

        model = CrossNetOpenUnmix(
            in_channels=config["in_channels"],
            hidden_channels=config.get("hidden_channels", 512),
            num_layers=config.get("num_layers", 3),
            n_bins=config["n_bins"], max_bin=config.get("max_bin"),
            dropout=config.get("dropout"), causal=config.get("causal", False),
            bridge=config.get("bridge", True),
            sources=tuple(config["sources"]),
        )
        return model, convert_xumx(state_dict, config)

    if any(k.startswith("encoder_blocks.") for k in state_dict):
        from ..models.mrx import MultiResolutionCrossNet

        num_layers = config.get("num_layers", 3)
        if isinstance(num_layers, (list, tuple)):
            num_layers = int(num_layers[0])
        rnn_type = config.get("rnn_type", "lstm")
        if isinstance(rnn_type, (list, tuple)):
            rnn_type = rnn_type[0]
        model = MultiResolutionCrossNet(
            in_channels=config["in_channels"],
            hidden_channels=config.get("hidden_channels", 512),
            num_layers=num_layers,
            n_fft=tuple(config["n_fft"]),
            hop_length=config["hop_length"],
            window_fn=config.get("window_fn", "hann"),
            causal=config.get("causal", False),
            rnn_type=rnn_type,
            sources=tuple(config["sources"]),
        )
        return model, convert_mrx(state_dict, config)

    if "separator.rnn.0.weight_ih_l0" in state_dict:
        from ..models.lstm_tasnet import LSTMTasNet

        model = LSTMTasNet(
            n_basis=config["n_basis"], kernel_size=config["kernel_size"],
            stride=config.get("stride"),
            enc_basis=config.get("enc_basis", "trainableGated"),
            dec_basis=config.get("dec_basis", "trainable"),
            sep_num_blocks=config.get("sep_num_blocks", 2),
            sep_num_layers=config.get("sep_num_layers", 2),
            sep_hidden_channels=config.get("sep_hidden_channels", 500),
            mask_nonlinear=config.get("mask_nonlinear", "softmax"),
            causal=config.get("causal", False),
            rnn_type=config.get("rnn_type", "lstm"),
            n_sources=config.get("n_sources", 2),
        )
        return model, convert_lstm_tasnet(state_dict, config)

    if any(k.startswith("separator.galr.") for k in state_dict):
        from ..models.galrnet import GALRNet

        model = GALRNet(
            n_basis=config["n_basis"], kernel_size=config["kernel_size"],
            stride=config.get("stride"),
            enc_basis=config.get("enc_basis", "trainable"),
            dec_basis=config.get("dec_basis", "trainable"),
            enc_nonlinear=config.get("enc_nonlinear"),
            sep_hidden_channels=config.get("sep_hidden_channels", 128),
            sep_chunk_size=config.get("sep_chunk_size", 100),
            sep_hop_size=config.get("sep_hop_size", 50),
            sep_down_chunk_size=config.get("sep_down_chunk_size"),
            sep_num_blocks=config.get("sep_num_blocks", 6),
            sep_num_heads=config.get("sep_num_heads", 4),
            mask_nonlinear=config.get("mask_nonlinear", "relu"),
            low_dimension=config.get("low_dimension", True),
            causal=config.get("causal", True),
            n_sources=config.get("n_sources", 2),
        )
        return model, convert_galrnet(state_dict, config)

    if any("multihead_attn_block" in k for k in state_dict):
        from ..models.dptnet import DPTNet

        model = DPTNet(
            n_basis=config["n_basis"], kernel_size=config["kernel_size"],
            stride=config.get("stride"),
            enc_basis=config.get("enc_basis", "trainable"),
            dec_basis=config.get("dec_basis", "trainable"),
            enc_nonlinear=config.get("enc_nonlinear"),
            sep_bottleneck_channels=config.get("sep_bottleneck_channels", 64),
            sep_hidden_channels=config.get("sep_hidden_channels", 256),
            sep_chunk_size=config.get("sep_chunk_size", 100),
            sep_hop_size=config.get("sep_hop_size"),
            sep_num_blocks=config.get("sep_num_blocks", 6),
            sep_num_heads=config.get("sep_num_heads", 4),
            mask_nonlinear=config.get("mask_nonlinear", "relu"),
            causal=config.get("causal", False), n_sources=config.get("n_sources", 2),
        )
        return model, convert_dptnet(state_dict, config)

    if "sep_num_layers_intra" in config or any("intra_transformer" in k for k in state_dict):
        model = SepFormer(
            n_basis=config["n_basis"], kernel_size=config["kernel_size"],
            stride=config.get("stride"),
            enc_nonlinear=config.get("enc_nonlinear"),
            sep_bottleneck_channels=config.get("sep_bottleneck_channels", 256),
            sep_chunk_size=config.get("sep_chunk_size", 250),
            sep_hop_size=config.get("sep_hop_size", 125),
            sep_num_blocks=config.get("sep_num_blocks", 2),
            sep_num_layers_intra=config.get("sep_num_layers_intra", config.get("sep_num_layers", 8)),
            sep_num_layers_inter=config.get("sep_num_layers_inter", config.get("sep_num_layers", 8)),
            sep_num_heads_intra=config.get("sep_num_heads_intra", config.get("sep_num_heads", 8)),
            sep_num_heads_inter=config.get("sep_num_heads_inter", config.get("sep_num_heads", 8)),
            sep_d_ff_intra=config.get("sep_d_ff_intra", 1024),
            sep_d_ff_inter=config.get("sep_d_ff_inter", 1024),
            mask_nonlinear=config.get("mask_nonlinear", "relu"),
            causal=config.get("causal", False), n_sources=config.get("n_sources", 2),
        )
        return model, convert_sepformer(state_dict, config)

    if "sep_chunk_size" in config and any("dprnn" in k for k in state_dict):
        model = DPRNNTasNet(
            n_basis=config["n_basis"], kernel_size=config["kernel_size"],
            stride=config.get("stride"),
            enc_basis=config.get("enc_basis", "trainable"),
            dec_basis=config.get("dec_basis", "trainable"),
            enc_nonlinear=config.get("enc_nonlinear"),
            sep_bottleneck_channels=config.get("sep_bottleneck_channels", 64),
            sep_hidden_channels=config.get("sep_hidden_channels", 128),
            sep_chunk_size=config.get("sep_chunk_size", 100),
            sep_hop_size=config.get("sep_hop_size", 50),
            sep_num_blocks=config.get("sep_num_blocks", 6),
            mask_nonlinear=config.get("mask_nonlinear", "sigmoid"),
            causal=config.get("causal", False), n_sources=config.get("n_sources", 2),
        )
        return model, convert_dprnn_tasnet(state_dict, config)

    if "anchor" in state_dict and "rnn.weight_ih_l0" in state_dict:
        from ..models.adanet import ADANet

        model = ADANet(
            n_bins=config["n_bins"], embed_dim=config["embed_dim"],
            hidden_channels=config.get("hidden_channels", 600),
            num_blocks=config.get("num_blocks", 4),
            num_anchors=config.get("num_anchors", 6),
            causal=config.get("causal", False),
            mask_nonlinear=config.get("mask_nonlinear", "sigmoid"),
            take_log=config.get("take_log", True),
            take_db=config.get("take_db", False),
            permute_anchors=config.get("permute_anchors", False),
        )
        return model, convert_adanet(state_dict, config)

    if "embed_dim" in config and "rnn.weight_ih_l0" in state_dict:
        from ..models.danet import DANet

        model = DANet(
            n_bins=config["n_bins"], embed_dim=config["embed_dim"],
            hidden_channels=config.get("hidden_channels", 300),
            num_blocks=config.get("num_blocks", 4),
            causal=config.get("causal", False),
            mask_nonlinear=config.get("mask_nonlinear", "sigmoid"),
            take_log=config.get("take_log", True),
            take_db=config.get("take_db", False),
        )
        return model, convert_danet(state_dict, config)

    if "n_bins" in config and "rnn.weight_ih_l0" in state_dict:
        model = OpenUnmix(
            in_channels=config["in_channels"],
            hidden_channels=config.get("hidden_channels", 512),
            num_layers=config.get("num_layers", 3),
            n_bins=config["n_bins"], max_bin=config.get("max_bin"),
            dropout=config.get("dropout"), causal=config.get("causal", False),
        )
        return model, convert_open_unmix(state_dict, config)

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
    return model, convert_conv_tasnet(state_dict, config)


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


def convert_danet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference DANet state_dict -> flax params tree.

    Reference paths (src/models/danet.py:47-48): rnn (nn.LSTM stacked
    num_blocks deep) + fc (Linear to n_bins*embed_dim).
    """
    causal = bool(config.get("causal", False))
    num_blocks = int(config.get("num_blocks", 4))
    return {"params": {
        "rnn": lstm_params(state_dict, "rnn", num_layers=num_blocks,
                           bidirectional=not causal),
        "fc": {
            "kernel": dense_weight(state_dict["fc.weight"]),
            "bias": _np(state_dict["fc.bias"]),
        },
    }}


def convert_adanet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference ADANet state_dict -> flax params tree.

    ADANet = DANet backbone (rnn + fc, src/models/adanet.py:14) plus the
    learned anchor bank (nn.Parameter (num_anchors, embed_dim), :28).
    """
    p = convert_danet(state_dict, config)
    p["params"]["anchor"] = _np(state_dict["anchor"])
    return p


def _mha_params(state_dict: Mapping, prefix: str) -> Dict:
    """torch nn.MultiheadAttention -> ops.attention.MultiheadAttention."""
    return {
        "in_proj": {
            "kernel": dense_weight(state_dict[f"{prefix}.in_proj_weight"]),
            "bias": _np(state_dict[f"{prefix}.in_proj_bias"]),
        },
        "out_proj": {
            "kernel": dense_weight(state_dict[f"{prefix}.out_proj.weight"]),
            "bias": _np(state_dict[f"{prefix}.out_proj.bias"]),
        },
    }


def _improved_transformer_params(state_dict: Mapping, prefix: str, causal: bool) -> Dict:
    """Reference DPTNet ImprovedTransformer (dptnet.py:463-575) -> our
    models.dptnet.ImprovedTransformer.

    Reference paths: {prefix}.multihead_attn_block.{multihead_attn,norm1d}
    and {prefix}.subnet.{rnn,fc,norm1d}. Our two unnamed layer norms in one
    compact scope auto-name as <Cls>_0 (post-attention) and <Cls>_1
    (post-FFN).
    """
    norm_cls = "CumulativeLayerNorm" if causal else "GlobalLayerNorm"
    return {
        "multihead_attn": _mha_params(state_dict, f"{prefix}.multihead_attn_block.multihead_attn"),
        f"{norm_cls}_0": _norm_params(state_dict, f"{prefix}.multihead_attn_block.norm1d"),
        "rnn": lstm_params(state_dict, f"{prefix}.subnet.rnn", bidirectional=not causal),
        "fc": {
            "kernel": dense_weight(state_dict[f"{prefix}.subnet.fc.weight"]),
            "bias": _np(state_dict[f"{prefix}.subnet.fc.bias"]),
        },
        f"{norm_cls}_1": _norm_params(state_dict, f"{prefix}.subnet.norm1d"),
    }


def convert_dptnet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference DPTNet state_dict -> flax params tree.

    Reference paths (src/models/dptnet.py): encoder.conv1d,
    decoder.conv_transpose1d, separator.{bottleneck_conv1d,norm2d,prelu,map,
    gtu} and separator.dptransformer.net.{i}.{intra,inter}_chunk_block.
    transformer (ImprovedTransformer: MHA block + LSTM feed-forward block).
    """
    causal = bool(config.get("causal", False))
    num_blocks = int(config.get("sep_num_blocks", 6))
    top_norm = "CumulativeLayerNorm_0" if causal else "GlobalLayerNorm_0"

    p: Dict = {}
    p["encoder"] = {"kernel": encoder_conv1d_weight(state_dict["encoder.conv1d.weight"])}
    p["decoder"] = {"kernel": conv_transpose1d_weight(state_dict["decoder.conv_transpose1d.weight"])}

    sep: Dict = {}
    sep["bottleneck_conv1d"] = _dense_params(state_dict, "separator.bottleneck_conv1d")
    sep[top_norm] = _norm_params(state_dict, "separator.norm2d")
    sep["prelu"] = {"alpha": _np(state_dict["separator.prelu.weight"]).reshape(())}
    sep["map"] = _dense_params(state_dict, "separator.map")
    sep["gtu_tanh"] = _dense_params(state_dict, "separator.gtu.map")
    sep["gtu_sigmoid"] = _dense_params(state_dict, "separator.gtu.map_gate")

    for i in range(num_blocks):
        ref = f"separator.dptransformer.net.{i}"
        sep[f"block{i}"] = {
            # Intra chunks always run bidirectional (reference :401-430).
            "intra_chunk_block": _improved_transformer_params(
                state_dict, f"{ref}.intra_chunk_block.transformer", causal=False),
            "inter_chunk_block": _improved_transformer_params(
                state_dict, f"{ref}.inter_chunk_block.transformer", causal=causal),
        }
    p["separator"] = sep
    return {"params": p}


def convert_galrnet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference GALRNet state_dict -> flax params tree.

    Reference paths (src/models/galrnet.py Separator:166, galr.py):
    separator.norm2d, separator.galr.net.{i}.intra_chunk_block
    ({rnn,fc,norm1d}, = DPRNN IntraChunkRNN) and .inter_chunk_block
    ({fc_map,fc_inv} in the low-dimension variant, norm2d_in.norm
    (LayerNormAlongChannel), multihead_attn, norm2d_out), then
    prelu/map/gtu like the other dual-path heads.
    """
    causal = bool(config.get("causal", True))
    num_blocks = int(config.get("sep_num_blocks", 6))
    low_dimension = bool(config.get("low_dimension", True))
    top_norm = "CumulativeLayerNorm_0" if causal else "GlobalLayerNorm_0"

    p: Dict = {}
    p["encoder"] = {"kernel": encoder_conv1d_weight(state_dict["encoder.conv1d.weight"])}
    p["decoder"] = {"kernel": conv_transpose1d_weight(state_dict["decoder.conv_transpose1d.weight"])}

    sep: Dict = {}
    sep[top_norm] = _norm_params(state_dict, "separator.norm2d")
    sep["prelu"] = {"alpha": _np(state_dict["separator.prelu.weight"]).reshape(())}
    sep["map"] = _dense_params(state_dict, "separator.map")
    sep["gtu_tanh"] = _dense_params(state_dict, "separator.gtu.map")
    sep["gtu_sigmoid"] = _dense_params(state_dict, "separator.gtu.map_gate")

    galr: Dict = {}
    for i in range(num_blocks):
        ref = f"separator.galr.net.{i}"
        intra = {
            "rnn": lstm_params(state_dict, f"{ref}.intra_chunk_block.rnn", bidirectional=True),
            "fc": {
                "kernel": dense_weight(state_dict[f"{ref}.intra_chunk_block.fc.weight"]),
                "bias": _np(state_dict[f"{ref}.intra_chunk_block.fc.bias"]),
            },
            "GlobalLayerNorm_0": _norm_params(state_dict, f"{ref}.intra_chunk_block.norm1d"),
        }
        gref = f"{ref}.inter_chunk_block"
        inter: Dict = {
            "norm_in": {
                "scale": _np(state_dict[f"{gref}.norm2d_in.norm.weight"]),
                "bias": _np(state_dict[f"{gref}.norm2d_in.norm.bias"]),
            },
            "multihead_attn": _mha_params(state_dict, f"{gref}.multihead_attn"),
            top_norm: _norm_params(state_dict, f"{gref}.norm2d_out"),
        }
        if low_dimension:
            inter["fc_map"] = {
                "kernel": dense_weight(state_dict[f"{gref}.fc_map.weight"]),
                "bias": _np(state_dict[f"{gref}.fc_map.bias"]),
            }
            inter["fc_inv"] = {
                "kernel": dense_weight(state_dict[f"{gref}.fc_inv.weight"]),
                "bias": _np(state_dict[f"{gref}.fc_inv.bias"]),
            }
        galr[f"block{i}"] = {"intra_chunk_block": intra, "inter_chunk_block": inter}
    sep["galr"] = galr
    p["separator"] = sep
    return {"params": p}


def conv_transpose2d_weight(w) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out).

    torch ConvTranspose2d is the gradient of a conv (implicitly flips the
    kernel); flax nn.ConvTranspose (transpose_kernel=False) cross-correlates
    with the kernel as given, so the spatial dims must be flipped here.
    """
    return np.transpose(_np(w), (2, 3, 0, 1))[::-1, ::-1].copy()


def _bn_params(state_dict: Mapping, prefix: str):
    """torch BatchNorm -> (flax params, batch stats)."""
    params = {
        "scale": _np(state_dict[f"{prefix}.weight"]),
        "bias": _np(state_dict[f"{prefix}.bias"]),
    }
    stats = {
        "mean": _np(state_dict[f"{prefix}.running_mean"]),
        "var": _np(state_dict[f"{prefix}.running_var"]),
    }
    return params, stats


def _conv2d_params(state_dict: Mapping, prefix: str):
    out = {"kernel": conv2d_weight(state_dict[f"{prefix}.weight"])}
    if f"{prefix}.bias" in state_dict:
        out["bias"] = _np(state_dict[f"{prefix}.bias"])
    return out


def _d2block_params(state_dict: Mapping, prefix: str, depth: int):
    """Reference D2Block (d2net.py:100) -> our d3net.D2Block {dense:{conv_block{i}}}."""
    params, stats = {}, {}
    for i in range(depth):
        blk_p, blk_s = {}, {}
        norm_p, norm_s = _bn_params(state_dict, f"{prefix}.net.{i}.norm2d")
        blk_p["norm2d"] = norm_p
        blk_s["norm2d"] = norm_s
        blk_p["conv2d"] = _conv2d_params(state_dict, f"{prefix}.net.{i}.conv2d")
        params[f"conv_block{i}"] = blk_p
        stats[f"conv_block{i}"] = blk_s
    return {"dense": params}, {"dense": stats}


def _d3block_params(state_dict: Mapping, prefix: str, num_d2blocks: int, depth: int):
    params, stats = {}, {}
    for k in range(num_d2blocks):
        p, s = _d2block_params(state_dict, f"{prefix}.net.{k}", depth)
        params[f"d2block{k}"] = p
        stats[f"d2block{k}"] = s
    return params, stats


def convert_d3net(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference D3Net state_dict -> flax variables (params + batch_stats).

    config mirrors the band-structured YAML (utils/config.py): per-band
    dicts for growth_rate/num_d2blocks/depth plus 'final' keys.
    """
    bands = list(config["bands"]) + ["full"]
    params: Dict = {}
    stats: Dict = {}

    params["scale_in"] = _np(state_dict["scale_in"])
    params["bias_in"] = _np(state_dict["bias_in"])
    params["scale_out"] = _np(state_dict["scale_out"])
    params["bias_out"] = _np(state_dict["bias_out"])

    for band in bands:
        bp: Dict = {}
        bs: Dict = {}
        ref = f"net.{band}"
        gr = config["growth_rate"][band]
        nd2 = config["num_d2blocks"][band]
        depth = config["depth"][band]
        n_stages = len(gr)
        n_enc = n_stages // 2

        bp["conv2d"] = _conv2d_params(state_dict, f"{ref}.conv2d")
        for i in range(n_enc):
            p, s = _d3block_params(state_dict, f"{ref}.encoder.net.{i}.d3block", nd2[i], depth[i])
            bp[f"encoder{i}"] = p
            bs[f"encoder{i}"] = s
        p, s = _d3block_params(state_dict, f"{ref}.bottleneck_conv2d", nd2[n_enc], depth[n_enc])
        bp["bottleneck"] = p
        bs["bottleneck"] = s
        for j, idx in enumerate(range(n_enc + 1, n_stages)):
            np_, ns_ = _bn_params(state_dict, f"{ref}.decoder.net.{j}.norm2d")
            bp[f"decoder{j}_norm"] = np_
            bs[f"decoder{j}_norm"] = ns_
            bp[f"decoder{j}_up"] = {
                "kernel": conv_transpose2d_weight(state_dict[f"{ref}.decoder.net.{j}.upsample2d.weight"]),
                "bias": _np(state_dict[f"{ref}.decoder.net.{j}.upsample2d.bias"]),
            }
            p, s = _d3block_params(state_dict, f"{ref}.decoder.net.{j}.d3block", nd2[idx], depth[idx])
            bp[f"decoder{j}"] = p
            bs[f"decoder{j}"] = s
        if f"{ref}.pointwise_conv2d.0.weight" in state_dict:
            np_, ns_ = _bn_params(state_dict, f"{ref}.pointwise_conv2d.0")
            bp["pointwise_norm"] = np_
            bs["pointwise_norm"] = ns_
            bp["pointwise_conv2d"] = _conv2d_params(state_dict, f"{ref}.pointwise_conv2d.1")
        params[f"net_{band}"] = bp
        stats[f"net_{band}"] = bs

    # Final D2 block + BN + GLU head. Checkpoint configs store flat
    # '*_final' keys (reference d3net.py:470-474); the recipe YAML nests
    # them under 'final' — accept both.
    depth_final = config.get("depth_final") or config.get("final", {}).get("depth")
    p, s = _d2block_params(state_dict, "d2block", depth_final)
    params["d2block"], stats["d2block"] = p, s
    np_, ns_ = _bn_params(state_dict, "norm2d")
    params["norm2d"], stats["norm2d"] = np_, ns_
    params["glu2d"] = {
        "map": _conv2d_params(state_dict, "glu2d.map"),
        "gate": _conv2d_params(state_dict, "glu2d.map_gate"),
    }
    return {"params": params, "batch_stats": stats}


def convert_lstm_tasnet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference LSTM-TasNet (src/models/tasnet.py:70) -> flax params.

    Gated (conv1d_U/conv1d_V) or plain trainable encoder, per-frame affine
    norm (gamma/beta), num_blocks skip-summed LSTMs, fc mask head,
    transposed-conv decoder.
    """
    p: Dict = {}

    if "encoder.conv1d_U.weight" in state_dict:
        p["encoder"] = {
            "kernel_U": encoder_conv1d_weight(state_dict["encoder.conv1d_U.weight"]),
            "kernel_V": encoder_conv1d_weight(state_dict["encoder.conv1d_V.weight"]),
        }
    else:
        p["encoder"] = {"kernel": encoder_conv1d_weight(state_dict["encoder.conv1d.weight"])}
    p["decoder"] = {"kernel": conv_transpose1d_weight(state_dict["decoder.conv_transpose1d.weight"])}

    causal = bool(config.get("causal", False))
    num_blocks = int(config.get("sep_num_blocks", 2))
    num_layers = int(config.get("sep_num_layers", 2))

    sep: Dict = {
        "gamma": _np(state_dict["separator.gamma"]).reshape(-1),
        "beta": _np(state_dict["separator.beta"]).reshape(-1),
        "fc": _dense_params(state_dict, "separator.fc", conv=False),
    }
    for idx in range(num_blocks):
        sep[f"rnn{idx}"] = lstm_params(
            state_dict, f"separator.rnn.{idx}",
            num_layers=num_layers, bidirectional=not causal,
        )
    p["separator"] = sep
    return {"params": p}


def convert_xumx(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference CrossNet-Open-Unmix (src/models/xumx.py:21) -> flax
    variables. Each `backbone.<source>` is an OpenUnmix-shaped stack."""
    causal = bool(config.get("causal", False))
    num_layers = int(config.get("num_layers", 3))
    sources = list(config["sources"])

    params: Dict = {}
    stats: Dict = {}
    for source in sources:
        ref = f"backbone.{source}"
        params[f"scale_in_{source}"] = _np(state_dict[f"{ref}.scale_in"])
        params[f"bias_in_{source}"] = _np(state_dict[f"{ref}.bias_in"])
        params[f"scale_out_{source}"] = _np(state_dict[f"{ref}.scale_out"])
        params[f"bias_out_{source}"] = _np(state_dict[f"{ref}.bias_out"])
        for ours, sub in ((f"block_{source}", "block"),
                          (f"net0_{source}", "net.0"),
                          (f"net1_{source}", "net.1")):
            bp, bs = _transform_block_params(state_dict, f"{ref}.{sub}")
            params[ours] = bp
            stats[ours] = bs
        params[f"rnn_{source}"] = lstm_params(
            state_dict, f"{ref}.rnn", num_layers=num_layers,
            bidirectional=not causal,
        )
    return {"params": params, "batch_stats": stats}


def _dense_block_params(state_dict: Mapping, prefix: str, depth: int):
    """Reference DenseBlock (m_densenet.py:662) -> {conv_block{i}: {norm2d, conv2d}}.

    ConvBlock2d may omit the norm (norm=False) -- detected per block.
    """
    params, stats = {}, {}
    for i in range(depth):
        blk_p, blk_s = {}, {}
        if f"{prefix}.net.{i}.norm2d.weight" in state_dict:
            norm_p, norm_s = _bn_params(state_dict, f"{prefix}.net.{i}.norm2d")
            blk_p["norm2d"] = norm_p
            blk_s["norm2d"] = norm_s
        blk_p["conv2d"] = _conv2d_params(state_dict, f"{prefix}.net.{i}.conv2d")
        params[f"conv_block{i}"] = blk_p
        stats[f"conv_block{i}"] = blk_s
    return params, stats


def _m_densenet_backbone_params(state_dict: Mapping, ref: str, n_stages: int, depth):
    """Reference MDenseNetBackbone (m_densenet.py:341) under prefix `ref` ->
    our MDenseNetBackbone param/stat trees."""
    n_enc = n_stages // 2
    bp: Dict = {"conv2d": _conv2d_params(state_dict, f"{ref}.conv2d")}
    bs: Dict = {}
    for i in range(n_enc):
        p, s = _dense_block_params(state_dict, f"{ref}.encoder.net.{i}.dense_block", depth[i])
        bp[f"encoder{i}"] = {"dense_block": p}
        bs[f"encoder{i}"] = {"dense_block": s}
    p, s = _dense_block_params(state_dict, f"{ref}.bottleneck_conv2d", depth[n_enc])
    bp["bottleneck"] = p
    bs["bottleneck"] = s
    for j, idx in enumerate(range(n_enc + 1, n_stages)):
        dref = f"{ref}.decoder.net.{j}"
        np_, ns_ = _bn_params(state_dict, f"{dref}.norm2d")
        p, s = _dense_block_params(state_dict, f"{dref}.dense_block", depth[idx])
        bp[f"decoder{j}"] = {
            "norm2d": np_,
            "upsample2d": {
                "kernel": conv_transpose2d_weight(state_dict[f"{dref}.upsample2d.weight"]),
                "bias": _np(state_dict[f"{dref}.upsample2d.bias"]),
            },
            "dense_block": p,
        }
        bs[f"decoder{j}"] = {"norm2d": ns_, "dense_block": s}
    if f"{ref}.pointwise_conv2d.0.weight" in state_dict:
        np_, ns_ = _bn_params(state_dict, f"{ref}.pointwise_conv2d.0")
        bp["pointwise_norm"] = np_
        bs["pointwise_norm"] = ns_
        bp["pointwise_conv2d"] = _conv2d_params(state_dict, f"{ref}.pointwise_conv2d.1")
    return bp, bs


def convert_mm_densenet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference MMDenseNet (src/models/mm_densenet.py:141) -> flax variables."""
    bands = list(config["bands"]) + ["full"]
    depth_cfg = config["depth"]
    growth_cfg = config["growth_rate"]

    params: Dict = {}
    stats: Dict = {}
    for name in ("scale_in", "bias_in", "scale_out", "bias_out"):
        params[name] = _np(state_dict[name])

    for band in bands:
        gr = growth_cfg[band]
        n_stages = len(gr)
        depth = depth_cfg[band]
        bp, bs = _m_densenet_backbone_params(state_dict, f"net.{band}", n_stages, depth)
        params[f"net_{band}"] = bp
        stats[f"net_{band}"] = bs

    depth_final = config.get("depth_final") or config.get("final", {}).get("depth")
    p, s = _dense_block_params(state_dict, "dense_block", depth_final)
    params["dense_block"], stats["dense_block"] = p, s
    np_, ns_ = _bn_params(state_dict, "norm2d")
    params["norm2d"], stats["norm2d"] = np_, ns_
    params["glu2d"] = {
        "map": _conv2d_params(state_dict, "glu2d.map"),
        "gate": _conv2d_params(state_dict, "glu2d.map_gate"),
    }
    return {"params": params, "batch_stats": stats}


def _frame_rnn_params(state_dict: Mapping, prefix: str, causal: bool) -> Dict:
    """Reference DenseRNN block's flat {bottleneck_conv2d, rnn, linear}
    (src/models/dense_rnn.py:160-206) -> our FrameRNN."""
    return {
        "bottleneck_conv2d": _conv2d_params(state_dict, f"{prefix}.bottleneck_conv2d"),
        "rnn": lstm_params(state_dict, f"{prefix}.rnn", num_layers=1,
                           bidirectional=not causal),
        "linear": _dense_params(state_dict, f"{prefix}.linear", conv=False),
    }


def _dense_rnn_block_params(state_dict: Mapping, prefix: str, depth: int,
                            hidden: int, causal: bool):
    """Reference DenseRNN*Block under `prefix` -> our DenseRNNBlock tree.

    hidden == 0: reference stores a plain DenseBlock (keys `{prefix}.net.{k}`).
    hidden > 0: reference flattens {dense_block, bottleneck_conv2d, rnn,
    linear}; ours nests the last three under rnn_block.
    """
    if hidden <= 0:
        p, s = _dense_block_params(state_dict, prefix, depth)
        return {"dense_block": p}, {"dense_block": s}
    if depth == 0:
        # Pure RNNBlock bottleneck (reference m_dense_rnn.py:75-81): flat
        # {bottleneck_conv2d, rnn, linear} and no dense path at all.
        return {"rnn_block": _frame_rnn_params(state_dict, prefix, causal)}, {}
    p, s = _dense_block_params(state_dict, f"{prefix}.dense_block", depth)
    params = {"dense_block": p, "rnn_block": _frame_rnn_params(state_dict, prefix, causal)}
    return params, {"dense_block": s}


def convert_mm_dense_rnn(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference MMDenseRNN/MMDenseLSTM (src/models/mm_dense_rnn.py:143,
    mm_dense_lstm.py:204) -> flax variables."""
    bands = list(config["bands"]) + ["full"]
    causal = bool(config.get("causal", False))
    depth_cfg = config["depth"]
    growth_cfg = config["growth_rate"]
    hidden_cfg = config["hidden_channels"]

    params: Dict = {}
    stats: Dict = {}
    for name in ("scale_in", "bias_in", "scale_out", "bias_out"):
        params[name] = _np(state_dict[name])

    for band in bands:
        gr = growth_cfg[band]
        n_stages = len(gr)
        n_enc = n_stages // 2
        depth = depth_cfg[band]
        hidden = hidden_cfg[band]
        ref = f"net.{band}"

        bp: Dict = {"conv2d": _conv2d_params(state_dict, f"{ref}.conv2d")}
        bs: Dict = {}
        for i in range(n_enc):
            # Encoder RNN blocks are unimplemented in the reference
            # (m_dense_rnn.py:217), so hidden[i] == 0 here.
            p, s = _dense_block_params(state_dict, f"{ref}.encoder.net.{i}.dense_block", depth[i])
            bp[f"encoder{i}"] = {"dense_block": p}
            bs[f"encoder{i}"] = {"dense_block": s}
        p, s = _dense_rnn_block_params(
            state_dict, f"{ref}.bottleneck_conv2d", depth[n_enc], hidden[n_enc], causal)
        bp["bottleneck"] = p
        bs["bottleneck"] = s
        for j, idx in enumerate(range(n_enc + 1, n_stages)):
            dref = f"{ref}.decoder.net.{j}"
            np_, ns_ = _bn_params(state_dict, f"{dref}.norm2d")
            bp[f"decoder{j}_norm"] = np_
            bs[f"decoder{j}_norm"] = ns_
            bp[f"decoder{j}_up"] = {
                "kernel": conv_transpose2d_weight(state_dict[f"{dref}.upsample2d.weight"]),
                "bias": _np(state_dict[f"{dref}.upsample2d.bias"]),
            }
            sub = f"{dref}.dense_rnn_block" if hidden[idx] > 0 else f"{dref}.dense_block"
            p, s = _dense_rnn_block_params(state_dict, sub, depth[idx], hidden[idx], causal)
            bp[f"decoder{j}"] = p
            bs[f"decoder{j}"] = s
        if f"{ref}.pointwise_conv2d.0.weight" in state_dict:
            np_, ns_ = _bn_params(state_dict, f"{ref}.pointwise_conv2d.0")
            bp["pointwise_norm"] = np_
            bs["pointwise_norm"] = ns_
            bp["pointwise_conv2d"] = _conv2d_params(state_dict, f"{ref}.pointwise_conv2d.1")
        params[f"net_{band}"] = bp
        stats[f"net_{band}"] = bs

    depth_final = config.get("depth_final") or config.get("final", {}).get("depth")
    hidden_final = int(config.get("hidden_channels_final") or 0)
    p, s = _dense_rnn_block_params(state_dict, "dense_block", depth_final, hidden_final, causal)
    params["dense_block"], stats["dense_block"] = p, s
    np_, ns_ = _bn_params(state_dict, "norm2d")
    params["norm2d"], stats["norm2d"] = np_, ns_
    params["glu2d"] = {
        "map": _conv2d_params(state_dict, "glu2d.map"),
        "gate": _conv2d_params(state_dict, "glu2d.map_gate"),
    }
    return {"params": params, "batch_stats": stats}


def convert_mrx(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference MultiResolutionCrossNet (src/models/mrx.py:14) -> flax
    variables. encoder scale_in/bias_in are dropped: the reference forward
    never applies them (see models/mrx.py docstring)."""
    causal = bool(config.get("causal", False))
    # get_config stores per-resolution lists for num_layers (mrx.py).
    num_layers = config.get("num_layers", 3)
    n_ffts = config["n_fft"]
    n_res = len(n_ffts) if isinstance(n_ffts, (list, tuple)) else 3
    if isinstance(num_layers, (list, tuple)):
        num_layers = [int(v) for v in num_layers]
    else:
        num_layers = [int(num_layers)] * n_res
    sources = list(config["sources"])

    params: Dict = {}
    stats: Dict = {}
    for i in range(n_res):
        bp, bs = _transform_block_params(state_dict, f"encoder_blocks.{i}.block")
        params[f"enc_block{i}"] = bp
        stats[f"enc_block{i}"] = bs
        params[f"rnn{i}"] = lstm_params(
            state_dict, f"encoder_blocks.{i}.rnn", num_layers=num_layers[i],
            bidirectional=not causal,
        )
    for source in sources:
        for i in range(n_res):
            ref = f"decoder_blocks.{source}.{i}"
            params[f"scale_out_{source}_{i}"] = _np(state_dict[f"{ref}.scale_out"])
            params[f"bias_out_{source}_{i}"] = _np(state_dict[f"{ref}.bias_out"])
            for ours, sub in ((f"dec_{source}_{i}_net0", "net.0"),
                              (f"dec_{source}_{i}_net1", "net.1")):
                bp, bs = _transform_block_params(state_dict, f"{ref}.{sub}")
                params[ours] = bp
                stats[ours] = bs
    return {"params": params, "batch_stats": stats}


def convert_densenet(state_dict: Mapping, config: Mapping) -> Dict:
    """Reference plain DenseNet (src/models/densenet.py:11) -> flax variables.

    Layout: preprocess 1x1 conv, then per block b: num_layers[b] DenseLayers
    (norm2d1/bottleneck_conv2d/norm2d2/conv2d) and a Transition2d
    (norm2d/conv2d).
    """
    num_blocks = int(config.get("num_blocks", 3))
    num_layers = config.get("num_layers", [2, 3, 4])
    if isinstance(num_layers, (list, tuple)):
        num_layers = [int(v) for v in num_layers]
    else:
        num_layers = [int(num_layers)] * num_blocks

    params: Dict = {"preprocess": _conv2d_params(state_dict, "preprocess")}
    stats: Dict = {}
    for b in range(num_blocks):
        blk_p: Dict = {}
        blk_s: Dict = {}
        for l in range(num_layers[b]):
            ref = f"net.{b}.net.{l}"
            n1p, n1s = _bn_params(state_dict, f"{ref}.norm2d1")
            n2p, n2s = _bn_params(state_dict, f"{ref}.norm2d2")
            blk_p[f"layer{l}"] = {
                "norm2d1": n1p,
                "bottleneck_conv2d": _conv2d_params(state_dict, f"{ref}.bottleneck_conv2d"),
                "norm2d2": n2p,
                "conv2d": _conv2d_params(state_dict, f"{ref}.conv2d"),
            }
            blk_s[f"layer{l}"] = {"norm2d1": n1s, "norm2d2": n2s}
        tp, ts = _bn_params(state_dict, f"net.{b}.transition2d.norm2d")
        blk_p["transition2d"] = {
            "norm2d": tp,
            "conv2d": _conv2d_params(state_dict, f"net.{b}.transition2d.conv2d"),
        }
        blk_s["transition2d"] = {"norm2d": ts}
        params[f"block{b}"] = blk_p
        stats[f"block{b}"] = blk_s
    return {"params": params, "batch_stats": stats}
