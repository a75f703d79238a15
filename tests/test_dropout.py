"""Training-time dropout: RNN inter-layer (torch nn.LSTM semantics),
transformer-layer placement, and rng threading through the train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dnn_based_source_separation_tpu.ops.attention import TransformerEncoderLayer
from dnn_based_source_separation_tpu.ops.rnn import LSTM


def test_lstm_dropout_inference_unchanged():
    """dropout>0 adds no params and is a no-op at inference."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 8), jnp.float32)
    plain = LSTM(hidden_size=6, num_layers=2)
    dropped = LSTM(hidden_size=6, num_layers=2, dropout=0.4)
    p0 = plain.init(jax.random.PRNGKey(0), x)
    p1 = dropped.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    y0 = plain.apply(p0, x)
    y1 = dropped.apply(p1, x)  # train=False default: deterministic, no rng needed
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_lstm_dropout_stochastic_in_train():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 10, 8), jnp.float32)
    model = LSTM(hidden_size=6, num_layers=2, dropout=0.5)
    params = model.init(jax.random.PRNGKey(0), x)
    ya = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    yb = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    ya2 = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(ya), np.asarray(yb))
    np.testing.assert_allclose(np.asarray(ya), np.asarray(ya2))
    # Single layer: torch applies dropout between layers only -> no-op.
    single = LSTM(hidden_size=6, num_layers=1, dropout=0.5)
    sp = single.init(jax.random.PRNGKey(0), x)
    y0 = single.apply(sp, x)
    y1 = single.apply(sp, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))


def test_transformer_layer_dropout():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 12, 16), jnp.float32)
    layer = TransformerEncoderLayer(d_model=16, num_heads=4, d_ff=32, dropout=0.3)
    params = layer.init(jax.random.PRNGKey(0), x)
    y_eval = layer.apply(params, x)
    y_tr = layer.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(5)})
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_tr))
    # dropout=0 layer has identical param structure (checkpoint compatible).
    plain = TransformerEncoderLayer(d_model=16, num_heads=4, d_ff=32)
    p0 = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(params)


def test_train_step_with_dropout_rng():
    """UMX with dropout trains through the rng-threaded step; rng advances."""
    from dnn_based_source_separation_tpu.criterion.distance import MSELoss
    from dnn_based_source_separation_tpu.models.umx import OpenUnmix
    from dnn_based_source_separation_tpu.train import make_optimizer, make_train_step

    n_bins, T = 9, 12
    model = OpenUnmix(in_channels=1, hidden_channels=16, num_layers=2,
                      n_bins=n_bins, dropout=0.4)
    x = jnp.abs(jnp.asarray(np.random.RandomState(3).randn(2, 1, n_bins, T), jnp.float32))
    t = jnp.abs(jnp.asarray(np.random.RandomState(4).randn(2, 1, n_bins, T), jnp.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(variables["params"])

    step = make_train_step(model, MSELoss(), opt, train_kwargs={"train": True},
                           with_dropout_rng=True)
    rng = jax.random.PRNGKey(7)
    variables, opt_state, loss, rng2 = step(variables, opt_state, x, t, rng)
    assert np.isfinite(float(loss))
    assert not np.array_equal(np.asarray(rng), np.asarray(rng2))
    variables, opt_state, loss2, rng3 = step(variables, opt_state, x, t, rng2)
    assert np.isfinite(float(loss2))
    assert not np.array_equal(np.asarray(rng2), np.asarray(rng3))


def test_sepformer_dptnet_dropout_knobs():
    """sep_dropout threads to the separator stacks; inference stays exact."""
    from dnn_based_source_separation_tpu.models.dptnet import DPTNet
    from dnn_based_source_separation_tpu.models.sepformer import SepFormer

    x = jnp.asarray(np.random.RandomState(6).randn(1, 1, 320), jnp.float32)
    for cls, kwargs in (
        (SepFormer, dict(n_basis=8, kernel_size=16, enc_basis="trainable",
                         dec_basis="trainable", sep_bottleneck_channels=8,
                         sep_chunk_size=10, sep_hop_size=5, sep_num_blocks=1,
                         sep_num_layers_intra=1, sep_num_layers_inter=1,
                         sep_num_heads_intra=2, sep_num_heads_inter=2,
                         sep_d_ff_intra=8, sep_d_ff_inter=8, sep_dropout=0.3)),
        (DPTNet, dict(n_basis=8, kernel_size=16, sep_bottleneck_channels=8,
                      sep_hidden_channels=8, sep_chunk_size=10,
                      sep_num_blocks=1, sep_num_heads=2, sep_dropout=0.3)),
    ):
        model = cls(**kwargs)
        params = model.init(jax.random.PRNGKey(0), x)
        y0 = model.apply(params, x)
        y0b = model.apply(params, x)  # no rng needed at inference
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y0b))
        ya = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        yb = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(ya), np.asarray(yb)), cls.__name__
        # dropout=0 twin has the identical param structure (ckpt compatible)
        plain = cls(**{**kwargs, "sep_dropout": 0.0})
        p0 = plain.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(params)
