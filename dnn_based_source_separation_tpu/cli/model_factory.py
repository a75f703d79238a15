"""Recipe model factory: --model flag + argparse namespace -> model instance.

Mirrors the per-recipe constructor calls in the reference's local/train.py
files (e.g. egs/wsj0-mix/conv-tasnet/local/train.py:62-124).
"""
from __future__ import annotations

from ..models import (
    ConvTasNet,
    DPRNNTasNet,
    DPTNet,
    FurcaNet,
    GALRNet,
    LSTMTasNet,
    SepFormer,
)


def build_wsj0mix_model(args):
    name = args.model.replace("_", "-")
    if name == "conv-tasnet":
        return ConvTasNet(
            n_basis=args.n_basis, kernel_size=args.kernel_size, stride=args.stride,
            enc_basis=args.enc_basis, dec_basis=args.dec_basis,
            enc_nonlinear=args.enc_nonlinear or None,
            sep_hidden_channels=args.sep_hidden_channels,
            sep_bottleneck_channels=args.sep_bottleneck_channels,
            sep_skip_channels=args.sep_skip_channels,
            sep_kernel_size=args.sep_kernel_size,
            sep_num_blocks=args.sep_num_blocks,
            sep_num_layers=args.sep_num_layers,
            causal=args.causal, mask_nonlinear=args.mask_nonlinear,
            n_sources=args.n_sources,
        )
    if name == "dprnn-tasnet":
        return DPRNNTasNet(
            n_basis=args.n_basis, kernel_size=args.kernel_size, stride=args.stride,
            enc_basis=args.enc_basis, dec_basis=args.dec_basis,
            enc_nonlinear=args.enc_nonlinear or None,
            sep_bottleneck_channels=args.sep_bottleneck_channels,
            sep_hidden_channels=args.sep_hidden_channels,
            sep_chunk_size=args.sep_chunk_size, sep_hop_size=args.sep_hop_size,
            sep_num_blocks=args.sep_num_blocks,
            causal=args.causal, mask_nonlinear=args.mask_nonlinear,
            n_sources=args.n_sources,
            rnn_type=getattr(args, "rnn_type", "lstm"),
        )
    if name == "lstm-tasnet":
        return LSTMTasNet(
            n_basis=args.n_basis, kernel_size=args.kernel_size, stride=args.stride,
            enc_basis=args.enc_basis or "trainableGated", dec_basis="trainable",
            sep_num_blocks=args.sep_num_blocks, sep_num_layers=args.sep_num_layers,
            sep_hidden_channels=args.sep_hidden_channels,
            causal=args.causal, mask_nonlinear=args.mask_nonlinear,
            n_sources=args.n_sources,
        )
    if name == "sepformer":
        return SepFormer(
            n_basis=args.n_basis, kernel_size=args.kernel_size, stride=args.stride,
            enc_nonlinear=args.enc_nonlinear or None,
            sep_bottleneck_channels=args.sep_bottleneck_channels,
            sep_chunk_size=args.sep_chunk_size, sep_hop_size=args.sep_hop_size,
            sep_num_blocks=args.sep_num_blocks,
            sep_num_layers_intra=args.sep_num_layers, sep_num_layers_inter=args.sep_num_layers,
            sep_num_heads_intra=args.sep_num_heads, sep_num_heads_inter=args.sep_num_heads,
            causal=args.causal, mask_nonlinear=args.mask_nonlinear,
            n_sources=args.n_sources,
        )
    if name == "dptnet":
        return DPTNet(
            n_basis=args.n_basis, kernel_size=args.kernel_size, stride=args.stride,
            enc_nonlinear=args.enc_nonlinear or None,
            sep_bottleneck_channels=args.sep_bottleneck_channels,
            sep_hidden_channels=args.sep_hidden_channels,
            sep_chunk_size=args.sep_chunk_size,
            sep_num_blocks=args.sep_num_blocks, sep_num_heads=args.sep_num_heads,
            causal=args.causal, mask_nonlinear=args.mask_nonlinear,
            n_sources=args.n_sources,
        )
    if name == "galrnet":
        return GALRNet(
            n_basis=args.n_basis, kernel_size=args.kernel_size, stride=args.stride,
            enc_nonlinear=args.enc_nonlinear or None,
            sep_hidden_channels=args.sep_hidden_channels,
            sep_chunk_size=args.sep_chunk_size, sep_hop_size=args.sep_hop_size,
            sep_down_chunk_size=args.sep_down_chunk_size,
            sep_num_blocks=args.sep_num_blocks, sep_num_heads=args.sep_num_heads,
            causal=args.causal, mask_nonlinear=args.mask_nonlinear,
            n_sources=args.n_sources,
        )
    if name == "furcanet":
        return FurcaNet(
            conv_hidden_channels=args.conv_hidden_channels,
            rnn_hidden_channels=args.rnn_hidden_channels,
            num_conv_blocks=args.num_conv_blocks,
            num_rnn_blocks=args.num_rnn_blocks,
            kernel_size=args.sep_kernel_size,
            nonlinear=args.mask_nonlinear,
            causal=args.causal,
            n_sources=args.n_sources,
        )
    raise ValueError(f"Unsupported model: {args.model}")
