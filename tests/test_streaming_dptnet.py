"""Why causal DPTNet has no exact-streaming path (round-5 verdict item 6).

The reference's own causal DPTNet applies NO causal mask to the inter-chunk
attention — `self.multihead_attn(x, x, x)` over all S chunks
(/root/reference/src/models/dptnet.py:516), with only the norms (cLN) and
the FFN LSTM (unidirectional) made causal. Our parity model mirrors that
(models/dptnet.py). Consequently every output frame depends on the entire
future of the stream, so no chunk-by-chunk pass can match the offline
forward — a structural rejection, not a missing feature. Even a
causally-MASKED variant would need an O(stream-length) KV cache rather than
the O(1) carried state `ExactStreamingSeparator` manages for DPRNN.

These tests pin both halves: the measured future-dependence of the parity
model, and the wrapper's explicit rejection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_based_source_separation_tpu.models import DPTNet
from dnn_based_source_separation_tpu.models.streaming import (
    ExactStreamingSeparator,
)

TINY = dict(
    n_basis=16, kernel_size=8, stride=4, sep_bottleneck_channels=12,
    sep_hidden_channels=16, sep_chunk_size=10, sep_num_blocks=2,
    sep_num_heads=2, causal=True, n_sources=2,
)


def test_causal_dptnet_output_depends_on_future():
    """Perturbing only the tail of the input moves the HEAD of the output:
    the parity causal DPTNet reads future chunks through its unmasked
    inter-chunk attention, so it is not streamable even in principle."""
    model = DPTNet(**TINY)
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((1, 1, 1600)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    x2 = x1.copy()
    x2[..., -200:] += rng.standard_normal((1, 1, 200)).astype(np.float32)

    y1 = np.asarray(model.apply(params, jnp.asarray(x1)))
    y2 = np.asarray(model.apply(params, jnp.asarray(x2)))
    head_delta = np.abs(y1[..., :400] - y2[..., :400]).max()
    assert head_delta > 1e-3, (
        "head output unexpectedly future-independent; if the model gained "
        "a causal attention mask, revisit the ExactStreamingSeparator "
        "rejection for DPTNet"
    )


def test_exact_streaming_rejects_dptnet_with_structural_reason():
    model = DPTNet(**TINY)
    x = jnp.zeros((1, 1, 320), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(NotImplementedError, match="attention-based"):
        ExactStreamingSeparator(model, variables, hop_samples=80)
