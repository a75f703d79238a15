"""Tensor parallelism: Megatron-style column/row sharding over a mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.3: models are <=
~30M params and `nn.DataParallel` is its entire story); this module is the
demonstration TP path for the one sub-model where width sharding is
natural — UMX's per-frame dense blocks (fc -> nonlinear -> fc, hidden 512,
reference `src/models/umx.py:533` TransformBlock1d).

Layout (the standard two-matmul recipe from the scaling playbook):
  * W1 (F, H) column-sharded over the 'model' axis — each device computes
    its H/n slice of the hidden activations, no communication;
  * W2 (H, O) row-sharded — each device contracts its hidden slice into a
    PARTIAL (.., O) result;
  * one psum over the 'model' axis completes the contraction (rides ICI).

Per block that is a single collective of the output size — the minimum any
width-sharded pair of matmuls can do.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def tp_dense_block(mesh: Mesh, x, w1, b1, w2, b2, nonlinear=jnp.tanh,
                   axis: str = "model"):
    """y = nonlinear(x @ w1 + b1) @ w2 + b2, hidden dim sharded over `axis`.

    x: (..., F) replicated. w1: (F, H), b1: (H,) — column-sharded (H).
    w2: (H, O) — row-sharded. b2: (O,) replicated. Returns replicated
    (..., O), numerically identical to the unsharded computation (up to
    psum summation order).
    """

    def block(xs, w1s, b1s, w2s, b2s):
        h = nonlinear(xs @ w1s + b1s)          # (..., H/n) local columns
        y = h @ w2s                             # (..., O) partial sums
        y = jax.lax.psum(y, axis)               # one collective over ICI
        return y + b2s

    return shard_map(
        block,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis, None), P()),
        out_specs=P(),
    )(x, w1, b1, w2, b2)


def tp_umx_transform(mesh: Mesh, x, params, axis: str = "model"):
    """Width-sharded UMX input transform: fc (column) -> tanh is fused into
    the following block via tp_dense_block; convenience wrapper applying a
    whole {w1, b1, w2, b2} param dict."""
    return tp_dense_block(
        mesh, x, params["w1"], params["b1"], params["w2"], params["b2"],
        axis=axis,
    )


# ---------------------------------------------------------------------------
# TP inside a REAL model forward: OpenUnmix with width-sharded transform
# blocks (round-2 verdict #6). TPOpenUnmix mirrors models/umx.py:OpenUnmix
# exactly — same parameter tree, loadable from the plain model's variables —
# but its three TransformBlock1d dense layers run under shard_map:
#   * block (C*max_bin -> H)  column-sharded: local matmul emits H/n columns,
#     reassembled by out_specs (XLA all_gathers only when needed);
#   * net0 (2H -> H)          column-sharded likewise;
#   * net1 (H -> C*n_bins)    row-sharded: each device contracts its H/n
#     slice, one psum completes the output.
# The LSTM and BatchNorms stay replicated (recurrences don't width-shard
# profitably at these sizes; BN in eval mode is elementwise).
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class _TPDense(nn.Module):
    """Drop-in for nn.Dense(use_bias=False) whose kernel is sharded over the
    mesh 'model' axis. Param name/shape identical to nn.Dense ("kernel")."""

    features: int
    mesh: Mesh
    shard: str = "col"  # 'col' (output dim) or 'row' (contraction dim)
    axis: str = "model"

    @nn.compact
    def __call__(self, x):
        F = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (F, self.features))
        axis = self.axis
        if self.shard == "col":
            out_spec = P(*([None] * (x.ndim - 1) + [axis]))
            return shard_map(
                lambda xs, ks: xs @ ks,
                mesh=self.mesh,
                in_specs=(P(), P(None, axis)),
                out_specs=out_spec,
                check_rep=False,
            )(x, kernel)
        if self.shard == "row":
            in_spec = P(*([None] * (x.ndim - 1) + [axis]))
            return shard_map(
                lambda xs, ks: jax.lax.psum(xs @ ks, axis),
                mesh=self.mesh,
                in_specs=(in_spec, P(axis, None)),
                out_specs=P(),
                check_rep=False,
            )(x, kernel)
        raise ValueError(f"Unsupported shard: {self.shard}")


class _TPTransformBlock1d(nn.Module):
    """TransformBlock1d (models/umx.py:27) with the dense layer TP-sharded."""

    out_features: int
    mesh: Mesh
    nonlinear: str | None = None
    shard: str = "col"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _TPDense(self.out_features, self.mesh, shard=self.shard, name="linear")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm")(x)
        if self.nonlinear == "tanh":
            x = jnp.tanh(x)
        elif self.nonlinear == "relu":
            x = nn.relu(x)
        return x


class TPOpenUnmix(nn.Module):
    """OpenUnmix forward with TP transform blocks; loads the PLAIN model's
    variables verbatim (identical param tree). Inference only."""

    mesh: Mesh
    in_channels: int
    hidden_channels: int = 512
    num_layers: int = 3
    n_bins: int = 33
    max_bin: int | None = None
    causal: bool = False
    rnn_type: str = "lstm"
    eps: float = 1e-12

    @nn.compact
    def __call__(self, input):
        from ..ops.rnn import choose_rnn

        n_bins = self.n_bins
        max_bin = self.max_bin or n_bins
        C, H = self.in_channels, self.hidden_channels
        B = input.shape[0]
        n_frames = input.shape[-1]

        scale_in = self.param("scale_in", nn.initializers.ones, (max_bin,))
        bias_in = self.param("bias_in", nn.initializers.zeros, (max_bin,))
        scale_out = self.param("scale_out", nn.initializers.ones, (n_bins,))
        bias_out = self.param("bias_out", nn.initializers.zeros, (n_bins,))

        x_valid = input[:, :, :max_bin]
        x = (x_valid - bias_in[:, None]) / (jnp.abs(scale_in[:, None]) + self.eps)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, n_frames, C * max_bin)

        x = _TPTransformBlock1d(H, self.mesh, nonlinear="tanh", shard="col",
                                name="block")(x)

        rnn_hidden = H if self.causal else H // 2
        x_rnn = choose_rnn(
            self.rnn_type, rnn_hidden, num_layers=self.num_layers,
            bidirectional=not self.causal, dropout=0.0, parent_name="rnn",
        )(x, train=False)
        x = jnp.concatenate([x, x_rnn], axis=-1)

        x = _TPTransformBlock1d(H, self.mesh, nonlinear="relu", shard="col",
                                name="net0")(x)
        x = _TPTransformBlock1d(C * n_bins, self.mesh, shard="row",
                                name="net1")(x)
        x = x.reshape(B, n_frames, C, n_bins)
        x = jnp.transpose(x, (0, 2, 3, 1))

        x = scale_out[:, None] * x + bias_out[:, None]
        mask = nn.relu(x)
        return mask * input
