"""Shared TasNet skeleton: pad -> encode -> mask -> decode -> unpad.

The reference repeats this extract_latent pattern across Conv-TasNet,
DPRNN-TasNet, DPTNet, SepFormer and GALRNet (`src/models/conv_tasnet.py:
116-171`, `src/models/dprnn_tasnet.py:103-131`, `src/models/sepformer.py:
105-145`); here it is factored once. Models provide `self.encoder`,
`self.decoder`, `self.separator` plus `kernel_size`/`_stride`/`dec_basis`
attributes and inherit the whole forward.
"""
from __future__ import annotations

import jax.numpy as jnp


class LatentMaskingMixin:
    """Forward pass shared by every time-domain masking TasNet."""

    def __call__(self, input, train: bool = False):
        output, _ = self.extract_latent(input, train=train)
        return output

    def extract_latent(self, input, train: bool = False):
        """(B, C_in, T) -> ((B, n_sources, T), latent (B, n_src, T', N)).

        `train` reaches the separator only when it declares dropout
        (stochastic paths); filterbanks are always deterministic.
        """
        B, C_in, T = input.shape
        stride = self._stride

        padding = (stride - (T - self.kernel_size) % stride) % stride
        pl, pr = padding // 2, padding - padding // 2
        x = jnp.pad(input, ((0, 0), (0, 0), (pl, pr)))
        x = jnp.moveaxis(x, 1, 2)  # channels-last (B, T, C_in)

        w = self.encoder(x)  # (B, T', N), possibly complex

        sep_kwargs = {"train": train} if getattr(self.separator, "dropout", 0.0) else {}
        if jnp.iscomplexobj(w):
            amplitude, phase = jnp.abs(w), jnp.angle(w)
            mask = self.separator(amplitude, **sep_kwargs)  # (B, n_src, T', F)
            w_hat = amplitude[:, None] * mask * jnp.exp(1j * phase[:, None])
        else:
            mask = self.separator(w, **sep_kwargs)
            w_hat = w[:, None] * mask  # (B, n_src, T', N)

        latent = w_hat
        if self.dec_basis == "pinv":
            x_hat = self.encoder.pinv_decode(w_hat)
        else:
            x_hat = self.decoder(w_hat)
        if x_hat.shape[-1] == 1:
            x_hat = x_hat[..., 0]  # (B, n_src, T_pad)
        else:
            # Multichannel decode (e.g. musdb18 stereo, reference
            # egs/musdb18/conv-tasnet/local/train.py:103 in_channels=2):
            # (B, n_src, T_pad, C) -> (B, n_src, C, T_pad).
            x_hat = jnp.moveaxis(x_hat, -1, 2)
        end = x_hat.shape[-1] - pr
        output = x_hat[..., pl:end]
        return output, latent
