"""Conv-TasNet: learned-filterbank masking separator.

Capability parity: reference `src/models/conv_tasnet.py` (ConvTasNet:16,
Separator:322, extract_latent:121-171): encoder -> gLN/cLN + 1x1 bottleneck
-> TDCN -> PReLU -> 1x1 mask head -> sigmoid/softmax -> mask x latent ->
decoder, with complex-aware mask application and padding to the stride grid.

TPU-first: the encoder/decoder are frame+matmul filterbanks (ops/filterbank),
the separator runs channels-last so every 1x1 conv is an MXU matmul, and all
shapes are static under jit (padding amounts are Python ints derived from
the static T).

Luo & Mesgarani, "Conv-TasNet: Surpassing Ideal Time-Frequency Magnitude
Masking for Speech Separation", arXiv:1809.07454.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.filterbank import choose_filterbank
from ..ops.norms import choose_layer_norm
from .base import SeparationModelMixin, register_model
from .modules import PReLU
from .skeleton import LatentMaskingMixin
from .tdcn import TimeDilatedConvNet, fold_mode

EPS = 1e-12


class Separator(nn.Module):
    """Mask estimator (reference Separator:322-380). (B, T', N) -> (B, n_src, T', N)."""

    num_features: int
    bottleneck_channels: int = 128
    hidden_channels: int = 256
    skip_channels: int = 128
    kernel_size: int = 3
    num_blocks: int = 3
    num_layers: int = 8
    dilated: bool = True
    separable: bool = True
    causal: bool = True
    nonlinear: str = "prelu"
    norm: bool = True
    mask_nonlinear: str = "sigmoid"
    n_sources: int = 2
    fold_norm_affine: object = False  # bool | "none" | "heads" | "all"
    remat: str = "none"
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, T, N = x.shape
        norm_name = "cLN" if self.causal else "gLN"
        mode = fold_mode(self.fold_norm_affine)
        # The separator-level gLN feeds the bottleneck matmul pad-free, so
        # it folds in both 'heads' and 'all' modes.
        fold = mode != "none" and not self.causal
        x = choose_layer_norm(norm_name, N, causal=self.causal, eps=self.eps,
                              affine=not fold)(x)
        x = nn.Dense(self.bottleneck_channels, name="bottleneck_conv1d")(x)
        x = TimeDilatedConvNet(
            num_features=self.bottleneck_channels,
            hidden_channels=self.hidden_channels,
            skip_channels=self.skip_channels,
            kernel_size=self.kernel_size,
            num_blocks=self.num_blocks,
            num_layers=self.num_layers,
            dilated=self.dilated,
            separable=self.separable,
            causal=self.causal,
            nonlinear=self.nonlinear,
            norm=self.norm,
            fold_affine=mode if not self.causal else "none",
            remat=self.remat,
            eps=self.eps,
            name="tdcn",
        )(x)
        x = PReLU(name="prelu")(x)
        x = nn.Dense(self.n_sources * self.num_features, name="mask_conv1d")(x)
        x = x.reshape(B, T, self.n_sources, self.num_features)
        x = jnp.moveaxis(x, 2, 1)  # (B, n_src, T', N)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(x)
        if self.mask_nonlinear == "softmax":
            return nn.softmax(x, axis=1)
        raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")


@register_model
class ConvTasNet(nn.Module, LatentMaskingMixin, SeparationModelMixin):
    """Full Conv-TasNet. Public API matches the reference: forward takes
    (B, C_in=1, T) and returns (B, n_sources, T)."""

    n_basis: int
    kernel_size: int
    stride: Optional[int] = None
    enc_basis: Optional[str] = "trainable"
    dec_basis: Optional[str] = "trainable"
    enc_nonlinear: Optional[str] = None
    window_fn: str = "hann"
    enc_onesided: bool = True
    enc_return_complex: bool = True
    sep_hidden_channels: int = 256
    sep_bottleneck_channels: int = 128
    sep_skip_channels: int = 128
    sep_kernel_size: int = 3
    sep_num_blocks: int = 3
    sep_num_layers: int = 8
    dilated: bool = True
    separable: bool = True
    sep_nonlinear: str = "prelu"
    sep_norm: bool = True
    mask_nonlinear: str = "sigmoid"
    causal: bool = True
    n_sources: int = 2
    fold_norm_affine: object = False  # bool | mode str; inference-only: see models/fold.py
    sep_remat: str = "none"  # remat policy for the TDCN blocks (training)
    eps: float = EPS
    in_channels: int = 1

    def setup(self):
        stride = self.stride or self.kernel_size // 2
        assert self.kernel_size % stride == 0, "kernel_size must be divisible by stride"
        self._stride = stride
        encoder, decoder = choose_filterbank(
            self.n_basis,
            kernel_size=self.kernel_size,
            stride=stride,
            enc_basis=self.enc_basis,
            dec_basis=self.dec_basis,
            enc_nonlinear=self.enc_nonlinear,
            window_fn=self.window_fn,
            enc_onesided=self.enc_onesided,
            enc_return_complex=self.enc_return_complex,
            in_channels=self.in_channels,
        )
        self.encoder = encoder
        self.decoder = decoder
        # The separator always sees n_basis features: for Fourier variants,
        # compute_valid_basis picks the DFT size so the (one/two-sided,
        # real/complex) encoder output has exactly n_basis channels, and
        # complex latents are masked on the magnitude (reference
        # conv_tasnet.py:152-160, src/utils/filterbank.py:52-67).
        num_features = self.n_basis
        self.separator = Separator(
            num_features=num_features,
            bottleneck_channels=self.sep_bottleneck_channels,
            hidden_channels=self.sep_hidden_channels,
            skip_channels=self.sep_skip_channels,
            kernel_size=self.sep_kernel_size,
            num_blocks=self.sep_num_blocks,
            num_layers=self.sep_num_layers,
            dilated=self.dilated,
            separable=self.separable,
            causal=self.causal,
            nonlinear=self.sep_nonlinear,
            norm=self.sep_norm,
            mask_nonlinear=self.mask_nonlinear,
            n_sources=self.n_sources,
            fold_norm_affine=self.fold_norm_affine,
            remat=self.sep_remat,
            eps=self.eps,
        )

    # __call__ / extract_latent inherited from LatentMaskingMixin.
