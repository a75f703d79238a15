"""YAML config builders for per-stem model configs.

Capability parity: reference `OpenUnmix.build_from_config`
(`src/models/umx.py:373-391`) and `D3Net.build_from_config`
(`src/models/d3net.py`), which read the recipe YAMLs
(`egs/musdb18/umx/config/paper/vocals.yaml`,
`egs/musdb18/d3net/config/paper/vocals.yaml:1-41`).
"""
from __future__ import annotations

import yaml


def build_umx_from_config(config_path: str):
    """YAML (in_channels, hidden_channels, num_layers, n_bins, max_bin,
    drop_out, causal) -> OpenUnmix instance."""
    from ..models.umx import OpenUnmix

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    return OpenUnmix(
        in_channels=cfg["in_channels"],
        hidden_channels=cfg.get("hidden_channels", 512),
        num_layers=cfg.get("num_layers", 3),
        n_bins=cfg["n_bins"],
        max_bin=cfg.get("max_bin"),
        dropout=cfg.get("drop_out", cfg.get("dropout")),
        causal=cfg.get("causal", False),
    )


def build_d3net_from_config(config_path: str):
    """Band-structured YAML -> D3Net instance (reference layout)."""
    from ..models.d3net import D3Net

    with open(config_path) as f:
        cfg = yaml.safe_load(f)

    bands = list(cfg["bands"])
    all_keys = bands + ["full"]

    def per_band(key, default=None):
        return {b: cfg[b].get(key, default) for b in all_keys}

    sections = [cfg[b]["sections"] for b in bands]
    final = cfg["final"]
    return D3Net(
        in_channels=cfg["in_channels"],
        num_features=per_band("num_features"),
        growth_rate=per_band("growth_rate"),
        kernel_size=per_band("kernel_size", 3),
        bands=bands,
        sections=sections,
        scale=per_band("scale", 2),
        num_d2blocks=per_band("num_d2blocks"),
        dilated=per_band("dilated", True),
        norm=per_band("norm", True),
        nonlinear=per_band("nonlinear", "relu"),
        depth=per_band("depth"),
        growth_rate_final=final["growth_rate"],
        kernel_size_final=final.get("kernel_size", 3),
        dilated_final=final.get("dilated", True),
        depth_final=final.get("depth"),
        norm_final=final.get("norm", True),
        nonlinear_final=final.get("nonlinear", "relu"),
    )


def _per_band(cfg, bands):
    all_keys = list(bands) + ["full"]

    def per_band(key, default=None):
        return {b: cfg[b].get(key, default) for b in all_keys}

    return per_band


def build_mmdensenet_from_config(config_path: str, parallel: bool = False,
                                 sources=("bass", "drums", "other", "vocals")):
    """Band-structured YAML -> MMDenseNet (reference
    egs/musdb18/mm-densenet/config/paper/*.yaml schema)."""
    from ..models.mm_densenet import MMDenseNet, ParallelMMDenseNet

    with open(config_path) as f:
        cfg = yaml.safe_load(f)

    bands = list(cfg["bands"])
    per_band = _per_band(cfg, bands)
    final = cfg["final"]
    kwargs = dict(
        in_channels=cfg["in_channels"],
        num_features=per_band("num_features"),
        growth_rate=per_band("growth_rate"),
        kernel_size=per_band("kernel_size", 3),
        bands=bands,
        sections=[cfg[b]["sections"] for b in bands],
        scale=per_band("scale", 2),
        dilated=per_band("dilated", False),
        norm=per_band("norm", True),
        nonlinear=per_band("nonlinear", "relu"),
        depth=per_band("depth"),
        growth_rate_final=final["growth_rate"],
        kernel_size_final=final.get("kernel_size", 3),
        dilated_final=final.get("dilated", False),
        norm_final=final.get("norm", True),
        nonlinear_final=final.get("nonlinear", "relu"),
        depth_final=final.get("depth"),
    )
    if parallel:
        return ParallelMMDenseNet(sources=tuple(sources), **kwargs)
    return MMDenseNet(**kwargs)


def build_mmdenselstm_from_config(config_path: str, parallel: bool = False,
                                  sources=("bass", "drums", "other", "vocals")):
    """Band-structured YAML -> MMDenseLSTM (reference
    egs/musdb18/mm-dense-lstm/config/*.yaml schema, incl. per-block
    hidden_channels and rnn_position/rnn_type)."""
    from ..models.mm_dense_rnn import MMDenseLSTM, ParallelMMDenseLSTM

    with open(config_path) as f:
        cfg = yaml.safe_load(f)

    bands = list(cfg["bands"])
    per_band = _per_band(cfg, bands)
    final = cfg["final"]
    position = {"parallel": "parallel", "after_dense": "after",
                "before_dense": "before"}[cfg.get("rnn_position", "parallel")]
    kwargs = dict(
        in_channels=cfg["in_channels"],
        num_features=per_band("num_features"),
        growth_rate=per_band("growth_rate"),
        hidden_channels=per_band("hidden_channels", 0),
        kernel_size=per_band("kernel_size", 3),
        bands=bands,
        sections=[cfg[b]["sections"] for b in bands],
        scale=per_band("scale", 2),
        dilated=per_band("dilated", False),
        norm=per_band("norm", True),
        nonlinear=per_band("nonlinear", "relu"),
        depth=per_band("depth"),
        growth_rate_final=final["growth_rate"],
        hidden_channels_final=final.get("hidden_channels", 0),
        kernel_size_final=final.get("kernel_size", 3),
        dilated_final=final.get("dilated", False),
        norm_final=final.get("norm", True),
        nonlinear_final=final.get("nonlinear", "relu"),
        depth_final=final.get("depth"),
        causal=cfg.get("causal", False),
        rnn_type=cfg.get("rnn_type", "lstm"),
        rnn_position=position,
    )
    if parallel:
        return ParallelMMDenseLSTM(sources=tuple(sources), **kwargs)
    return MMDenseLSTM(**kwargs)
