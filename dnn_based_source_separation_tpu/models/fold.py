"""Inference-time gLN affine folding for Conv-TasNet-style TDCN separators.

The TDCN forward is VPU-throughput-bound (BENCHMARKS.md "TDCN dtype
sweep"), so every per-element multiply/add removed is real latency. Each
gLN's trailing affine (gamma * xhat + beta) feeds a LINEAR op:

- the separator-level gLN feeds the 1x1 bottleneck matmul
  (reference `src/models/conv_tasnet.py:344-350`),
- each residual block's gLN feeds the (padded) depthwise conv
  (reference `src/models/tdcn.py:96-116`),
- each separable-conv gLN feeds the 1x1 output/skip head matmuls
  (reference `src/models/tdcn.py:170-196`),

so gamma folds into the following weights and beta into the following
bias — pure algebra, zero quality change:

  1x1 matmul W (C_in, C_out):  W' = diag(gamma) @ W,  b' = b + beta @ W
  depthwise kernel w (K,1,C):  w'[k,0,c] = gamma_c * w[k,0,c],
                               b'_c = b_c + beta_c * sum_k w[k,0,c]

The depthwise case has one subtlety: the original model ZERO-pads the
post-affine activations before the conv, so the folded model pads the
pre-affine normalized frames with -beta/gamma instead (the value whose
affine image is zero) — `GlobalLayerNorm(affine=False)` does this; its
gamma/beta params stay in the pytree untouched for exactly that purpose
(and for checkpoint compatibility).

Inference-only: gamma/beta must remain independent parameters while
training. Apply to a trained checkpoint:

    folded_model, folded_vars = fold_gln_affine(model, variables)

Exactness is float-reassociation-level (~1e-6 rtol in f32); see
tests/test_fold.py.
"""
from __future__ import annotations

def _copy_tree(tree):
    """Deep-copy the dict spine (leaves shared) so folding never mutates
    the caller's variables; also converts FrozenDict-style mappings."""
    if hasattr(tree, "items"):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree


def _fold_into_matmul(gamma, beta, head):
    """gLN affine -> following Dense (kernel (C_in, C_out), bias (C_out,))."""
    kernel = head["kernel"]
    head["bias"] = head["bias"] + beta @ kernel
    head["kernel"] = gamma[:, None] * kernel


def _fold_into_depthwise(gamma, beta, dw):
    """gLN affine -> following depthwise conv (kernel (K, 1, C), bias (C,))."""
    kernel = dw["kernel"]
    dw["bias"] = dw["bias"] + beta * kernel.sum(axis=(0, 1))
    dw["kernel"] = kernel * gamma[None, None, :]


def fold_gln_affine(model, variables, mode: str = "heads"):
    """Fold gLN affines of a non-causal Conv-TasNet into the adjacent
    linear weights. Returns (folded_model, folded_variables); `variables`
    must be UNFOLDED (folding twice double-applies the affine).

    mode='heads' (default) folds only the pad-free affines — the
    separator-level gLN into the bottleneck matmul and each separable-conv
    gLN into its output/skip head matmuls. mode='all' additionally folds
    each block gLN into its depthwise conv via the -beta/gamma padding
    fill; measured SLOWER at full-model scale on v5e (the per-channel
    concatenate fill breaks XLA's pad+FMA fusion — BENCHMARKS.md kernel
    notes), kept for completeness.
    """
    from .tdcn import fold_mode

    mode = fold_mode(mode)
    if mode == "none":
        return model, variables
    if getattr(model, "causal", True):
        raise ValueError("gLN affine folding requires a non-causal model (cLN is causal)")
    if getattr(model, "sep_norm", True) and not getattr(model, "separable", True):
        raise NotImplementedError("affine folding is implemented for the separable TDCN")

    variables = _copy_tree(variables)
    params = variables["params"]
    sep = params["separator"]

    # The separator-level gLN exists even when sep_norm=False (it disables
    # only the TDCN-internal norms — reference conv_tasnet.py:344).
    g = sep["GlobalLayerNorm_0"]
    _fold_into_matmul(g["gamma"], g["beta"], sep["bottleneck_conv1d"])
    if not getattr(model, "sep_norm", True):
        return model.clone(fold_norm_affine=mode), variables

    for block in (v for k, v in sep["tdcn"].items() if k.startswith("block")):
        for layer in (v for k, v in block.items() if k.startswith("layer")):
            conv = layer["separable_conv1d"]
            if mode == "all":
                g1 = layer["GlobalLayerNorm_0"]
                # gamma/beta stay live here: GlobalLayerNorm(affine=False)
                # reads them to build the -beta/gamma padding fill.
                _fold_into_depthwise(g1["gamma"], g1["beta"],
                                     conv["depthwise_conv1d"])
            g2 = conv["GlobalLayerNorm_0"]
            for head in ("output_pointwise_conv1d", "skip_pointwise_conv1d"):
                if head in conv:
                    _fold_into_matmul(g2["gamma"], g2["beta"], conv[head])

    return model.clone(fold_norm_affine=mode), variables
