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
