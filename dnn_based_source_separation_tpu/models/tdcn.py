"""Time-dilated convolutional network (Conv-TasNet separator backbone).

Capability parity: reference `src/models/tdcn.py:13-220`
(TimeDilatedConvNet, TimeDilatedConvBlock1d, ResidualBlock1d,
DepthwiseSeparableConv1d): R blocks x X layers of dilated
depthwise-separable residual units with dual residual/skip heads.

TPU-first: channels-last (B, T, C); 1x1 convs are Dense (pure MXU matmuls);
the depthwise conv is `nn.Conv(feature_group_count=C)` which XLA lowers to a
VPU-friendly strided elementwise contraction and fuses with the surrounding
pointwise ops. Dilations are static so the whole R*X stack unrolls into one
fused XLA program.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import choose_layer_norm
from .modules import PReLU

EPS = 1e-12


def fold_mode(v) -> str:
    """Normalize a fold_affine flag: False->'none', True->'all', str kept.

    'heads' folds only the PAD-FREE affines (the separator-level gLN into
    the bottleneck matmul and each separable-conv gLN into its output/skip
    head matmuls); 'all' additionally folds each block gLN into its
    depthwise conv, which requires the -beta/gamma padding fill
    (models/fold.py) — measured SLOWER at full-model scale because the
    per-channel concatenate fill breaks XLA's pad+FMA fusion
    (BENCHMARKS.md kernel notes), so 'heads' is the recommended mode.
    """
    if v is True:
        return "all"
    if v is False or v is None:
        return "none"
    if v in ("none", "heads", "all"):
        return v
    raise ValueError(f"Unsupported fold_affine mode: {v!r}")


class DepthwiseConv1dShift(nn.Module):
    """Stride-1 dilated depthwise conv as K shifted fused-multiply-adds.

    Mathematically identical to `nn.Conv(features=C, feature_group_count=C,
    padding=VALID)` with an IDENTICAL parameter pytree (kernel (K, 1, C) +
    bias), but lowered as K strided slices * broadcast weights — pure
    elementwise FMAs XLA fuses into the surrounding pointwise chain, instead
    of a grouped-convolution op. The depthwise convs are <1% of the TDCN's
    FLOPs; this removes their (and their gradients') un-fused kernel cost.
    """

    in_channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        C, K, d = self.in_channels, self.kernel_size, self.dilation
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (K, 1, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        T_out = x.shape[-2] - (K - 1) * d
        y = bias
        for k in range(K):
            y = y + x[..., k * d : k * d + T_out, :] * kernel[k, 0]
        return y


class DepthwiseSeparableConv1d(nn.Module):
    """depthwise (dilated) -> [prelu] -> [norm] -> pointwise out/skip heads.

    Reference `src/models/tdcn.py:149-202`. Input is already padded.
    """

    in_channels: int
    out_channels: int
    skip_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    causal: bool = True
    nonlinear: Optional[str] = None
    norm: bool = True
    dual_head: bool = True
    fold_affine: object = False  # bool | "none" | "heads" | "all" (see fold_mode)
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        C = self.in_channels
        if self.stride == 1:
            x = DepthwiseConv1dShift(
                in_channels=C,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                name="depthwise_conv1d",
            )(x)
        else:
            x = nn.Conv(
                features=C,
                kernel_size=(self.kernel_size,),
                strides=(self.stride,),
                kernel_dilation=(self.dilation,),
                feature_group_count=C,
                padding="VALID",
                name="depthwise_conv1d",
            )(x)
        if self.nonlinear == "prelu":
            x = PReLU(name="nonlinear1d")(x)
        elif self.nonlinear is not None:
            raise ValueError(f"Unsupported nonlinearity: {self.nonlinear}")
        if self.norm:
            norm_name = "cLN" if self.causal else "gLN"
            # g2 (pre-heads) folds in both 'heads' and 'all' modes: pad-free.
            affine = not (fold_mode(self.fold_affine) != "none" and not self.causal)
            x = choose_layer_norm(norm_name, C, causal=self.causal,
                                  eps=self.eps, affine=affine)(x)
        output = None
        if self.dual_head:
            output = nn.Dense(self.out_channels, name="output_pointwise_conv1d")(x)
        skip = nn.Dense(self.skip_channels, name="skip_pointwise_conv1d")(x)
        return output, skip


class ResidualBlock1d(nn.Module):
    """1x1 bottleneck -> [prelu][norm] -> pad -> (separable) conv -> heads.

    Reference `src/models/tdcn.py:77-147`.
    """

    num_features: int
    hidden_channels: int = 256
    skip_channels: int = 256
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    separable: bool = False
    causal: bool = True
    nonlinear: Optional[str] = None
    norm: bool = True
    dual_head: bool = True
    fold_affine: object = False  # bool | "none" | "heads" | "all" (see fold_mode)
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        T = x.shape[-2]
        residual = x
        h = nn.Dense(self.hidden_channels, name="bottleneck_conv1d")(x)
        if self.nonlinear == "prelu":
            h = PReLU(name="nonlinear1d")(h)
        elif self.nonlinear is not None:
            raise ValueError(f"Unsupported nonlinearity: {self.nonlinear}")

        padding = (T - 1) * self.stride - T + (self.kernel_size - 1) * self.dilation + 1
        if self.causal:
            pl, pr = padding, 0
        else:
            pl, pr = padding // 2, padding - padding // 2
        # g1 (pre-depthwise) folds only in 'all' mode: it needs the
        # -beta/gamma padding fill, measured slower at model scale.
        fold = (fold_mode(self.fold_affine) == "all"
                and self.norm and not self.causal)
        if self.norm:
            norm_name = "cLN" if self.causal else "gLN"
            norm_mod = choose_layer_norm(norm_name, self.hidden_channels,
                                         causal=self.causal, eps=self.eps,
                                         affine=not fold)
            if fold:
                # Folded inference: gamma/beta live in the downstream conv
                # weights; the norm pads with -beta/gamma so the folded conv
                # over padded frames equals the zero-padded-affine original.
                h = norm_mod(h, pad=(pl, pr))
            else:
                h = norm_mod(h)
        if fold:
            pass  # already padded inside the norm
        elif (self.causal and padding > 0 and self.is_mutable_collection("stream")
                and not self.is_initializing()):
            # Exact streaming: the left context is the tail of the previous
            # chunk's (post-norm) activations instead of zeros; the zero
            # initial state IS the offline zero padding, so chunked equals
            # offline exactly. Only the dilated stride-1 topology streams.
            if self.stride != 1:
                raise NotImplementedError(
                    "exact streaming requires stride-1 residual blocks")
            ctx = self.variable(
                "stream", "ctx",
                lambda: jnp.zeros(h.shape[:-2] + (pl, h.shape[-1]), h.dtype))
            h = jnp.concatenate([ctx.value, h], axis=-2)
            ctx.value = h[..., -pl:, :]
        else:
            h = jnp.pad(h, ((0, 0), (pl, pr), (0, 0)))

        if self.separable:
            output, skip = DepthwiseSeparableConv1d(
                in_channels=self.hidden_channels,
                out_channels=self.num_features,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                stride=self.stride,
                dilation=self.dilation,
                causal=self.causal,
                nonlinear=self.nonlinear,
                norm=self.norm,
                dual_head=self.dual_head,
                fold_affine=self.fold_affine,
                eps=self.eps,
                name="separable_conv1d",
            )(h)
        else:
            output = None
            if self.dual_head:
                output = nn.Conv(
                    self.num_features, (self.kernel_size,), strides=(self.stride,),
                    kernel_dilation=(self.dilation,), padding="VALID", name="output_conv1d",
                )(h)
            skip = nn.Conv(
                self.skip_channels, (self.kernel_size,), strides=(self.stride,),
                kernel_dilation=(self.dilation,), padding="VALID", name="skip_conv1d",
            )(h)

        if output is not None:
            output = output + residual
        return output, skip


class TimeDilatedConvBlock1d(nn.Module):
    """X layers with dilation 2^i and summed skip head (reference :43-76)."""

    num_features: int
    hidden_channels: int = 256
    skip_channels: int = 256
    kernel_size: int = 3
    num_layers: int = 10
    dilated: bool = True
    separable: bool = False
    causal: bool = True
    nonlinear: Optional[str] = None
    norm: bool = True
    dual_head: bool = True
    fold_affine: object = False  # bool | "none" | "heads" | "all" (see fold_mode)
    remat: str = "none"  # "none" | "block" (save nothing) | "dots" (save matmuls)
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        # Rematerialisation per residual block: the training backward pass
        # is HBM-bandwidth bound on the saved hidden_channels-wide
        # intermediates (4x the block I/O width); rematerialising them from
        # the block input trades cheap recompute FLOPs for that traffic.
        if self.remat == "none":
            Block = ResidualBlock1d
        elif self.remat == "block":
            Block = nn.remat(ResidualBlock1d, prevent_cse=False)
        elif self.remat == "dots":
            Block = nn.remat(ResidualBlock1d, prevent_cse=False,
                             policy=jax.checkpoint_policies.dots_saveable)
        else:
            raise ValueError(f"Unsupported remat mode: {self.remat}")
        skip_connection = 0.0
        for idx in range(self.num_layers):
            dilation = 2**idx if self.dilated else 1
            stride = 1 if self.dilated else 2
            last = (not self.dual_head) and idx == self.num_layers - 1
            x_out, skip = Block(
                num_features=self.num_features,
                hidden_channels=self.hidden_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                stride=stride,
                dilation=dilation,
                separable=self.separable,
                causal=self.causal,
                nonlinear=self.nonlinear,
                norm=self.norm,
                dual_head=not last,
                fold_affine=self.fold_affine,
                eps=self.eps,
                name=f"layer{idx}",
            )(x)
            skip_connection = skip_connection + skip
            if x_out is not None:
                x = x_out
        return x, skip_connection


class TimeDilatedConvNet(nn.Module):
    """R blocks of X dilated layers; output = sum of skips (reference :13-41)."""

    num_features: int
    hidden_channels: int = 256
    skip_channels: int = 256
    kernel_size: int = 3
    num_blocks: int = 3
    num_layers: int = 10
    dilated: bool = True
    separable: bool = False
    causal: bool = True
    nonlinear: Optional[str] = None
    norm: bool = True
    fold_affine: object = False  # bool | "none" | "heads" | "all" (see fold_mode)
    remat: str = "none"
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        skip_connection = 0.0
        for idx in range(self.num_blocks):
            dual_head = idx != self.num_blocks - 1
            x, skip = TimeDilatedConvBlock1d(
                num_features=self.num_features,
                hidden_channels=self.hidden_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                num_layers=self.num_layers,
                dilated=self.dilated,
                separable=self.separable,
                causal=self.causal,
                nonlinear=self.nonlinear,
                norm=self.norm,
                dual_head=dual_head,
                fold_affine=self.fold_affine,
                remat=self.remat,
                eps=self.eps,
                name=f"block{idx}",
            )(x)
            skip_connection = skip_connection + skip
        return skip_connection
