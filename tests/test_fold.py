"""gLN affine folding (models/fold.py): folded inference == unfolded.

The fold moves every gLN's gamma/beta into the adjacent linear weights
(bottleneck matmul, depthwise conv, output/skip head matmuls) and pads
normalized frames with -beta/gamma instead of zero-padding post-affine
frames, so the folded non-causal Conv-TasNet must reproduce the original
forward to float-reassociation precision — including the frames whose
receptive field spans the padding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_based_source_separation_tpu.models import ConvTasNet
from dnn_based_source_separation_tpu.models.fold import fold_gln_affine

CFG = dict(
    n_basis=16, kernel_size=8, stride=4, sep_num_blocks=2, sep_num_layers=3,
    sep_hidden_channels=20, sep_bottleneck_channels=12, sep_skip_channels=12,
    causal=False, n_sources=2,
)


def _rand_variables(model, x, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), x)
    # Random (non-identity) gamma/beta everywhere so the fold is actually
    # exercised — init leaves gamma=1, beta=0 which would fold trivially.
    rng = np.random.default_rng(seed)

    def scramble(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "gamma":
            return jnp.asarray(0.5 + rng.random(leaf.shape, np.float32))
        if name == "beta":
            return jnp.asarray(rng.standard_normal(leaf.shape).astype(np.float32))
        return leaf

    return jax.tree_util.tree_map_with_path(scramble, variables)


@pytest.mark.parametrize("mode", ["heads", "all"])
def test_folded_forward_matches_unfolded(mode):
    model = ConvTasNet(**CFG)
    # T short enough that dilation-8 padding spans a large fraction of the
    # frames: in 'all' mode the -beta/gamma padding fill is load-bearing.
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1, 640)),
                    jnp.float32)
    variables = _rand_variables(model, x)
    y_ref = model.apply(variables, x)

    folded_model, folded_vars = fold_gln_affine(model, variables, mode=mode)
    assert folded_model.fold_norm_affine == mode
    y_fold = folded_model.apply(folded_vars, x)

    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=0, atol=5e-5)


def test_fold_does_not_mutate_input_variables():
    model = ConvTasNet(**CFG)
    x = jnp.zeros((1, 1, 320), jnp.float32)
    variables = _rand_variables(model, x)
    before = jax.tree_util.tree_map(np.asarray, variables)
    fold_gln_affine(model, variables)
    after = jax.tree_util.tree_map(np.asarray, variables)
    jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)


def test_folded_forward_matches_unfolded_without_tdcn_norms():
    # sep_norm=False drops the TDCN-internal gLNs but the separator-level
    # gLN remains (reference conv_tasnet.py:344) and must still fold.
    model = ConvTasNet(**dict(CFG, sep_norm=False))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 1, 640)),
                    jnp.float32)
    variables = _rand_variables(model, x, seed=3)
    y_ref = model.apply(variables, x)
    folded_model, folded_vars = fold_gln_affine(model, variables)
    np.testing.assert_allclose(np.asarray(folded_model.apply(folded_vars, x)),
                               np.asarray(y_ref), rtol=0, atol=5e-5)


def test_fold_rejects_causal():
    model = ConvTasNet(**dict(CFG, causal=True))
    x = jnp.zeros((1, 1, 320), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="non-causal"):
        fold_gln_affine(model, variables)
