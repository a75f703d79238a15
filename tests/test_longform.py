"""Long-form chunked-scan inference tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models.longform import separate_longform


def test_identity_model_crossfade_is_transparent():
    """With an identity 'separator', chunked OLA must reproduce the input."""

    def apply_fn(params, chunk):  # (B, 1, C) -> (B, 2, C)
        return jnp.concatenate([chunk, chunk], axis=1)

    rng = np.random.default_rng(0)
    T = 3000
    x = jnp.asarray(rng.standard_normal((1, 1, T)), jnp.float32)
    y = separate_longform(apply_fn, None, x, chunk_samples=512, n_sources=2)
    assert y.shape == (1, 2, T)
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(y[:, 1]), np.asarray(x[:, 0]), atol=1e-4)


def test_real_model_longform_matches_shapes():
    from dnn_based_source_separation_tpu.models import ConvTasNet

    model = ConvTasNet(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=8, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=2, causal=False, n_sources=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 512)))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, 2000)), jnp.float32)
    y = separate_longform(model.apply, params, x, chunk_samples=512, n_sources=2)
    assert y.shape == (1, 2, 2000)
    assert np.all(np.isfinite(np.asarray(y)))


def test_short_input_single_chunk():
    def apply_fn(params, chunk):
        return jnp.stack([chunk[:, 0], -chunk[:, 0]], axis=1)

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 1, 100)), jnp.float32)
    y = separate_longform(apply_fn, None, x, chunk_samples=256, n_sources=2)
    assert y.shape == (2, 2, 100)
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]), atol=1e-5)


def test_streaming_matches_offline_for_causal_model():
    """Chunk-by-chunk causal inference == offline forward on the same audio."""
    import jax

    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.models.streaming import StreamingSeparator

    model = ConvTasNet(n_basis=16, kernel_size=8, stride=4,
                       enc_basis="trainable", dec_basis="trainable",
                       enc_nonlinear="relu", sep_hidden_channels=16,
                       sep_bottleneck_channels=8, sep_skip_channels=8,
                       sep_num_blocks=1, sep_num_layers=3,
                       causal=True, n_sources=2)
    rng = np.random.default_rng(0)
    T, hop, ctx = 4000, 500, 1000
    x = rng.standard_normal((1, T)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, T)))

    offline = np.asarray(model.apply(params, jnp.asarray(x)[None]))[0]

    stream = StreamingSeparator(model, params, hop_samples=hop, context_samples=ctx)
    outs = [stream.process(x[:, s:s + hop]) for s in range(0, T, hop)]
    streamed = np.concatenate(outs, axis=-1)

    # Finite-context streaming approximates the offline pass: the convs are
    # strictly causal, but cLN statistics are cumulative from the STREAM
    # start offline vs the WINDOW start when streamed, so agreement is
    # bounded rather than exact (measured ~23 dB for this config, flat in
    # context length). Assert a conservative floor.
    a, b = streamed[..., ctx:], offline[..., ctx:]
    snr = 10 * np.log10(float((b ** 2).sum()) / float(((a - b) ** 2).sum()))
    assert snr > 20.0, f"streamed/offline agreement too low: {snr:.1f} dB"


def _causal_tiny(n_basis=16, L=16, S=8):
    from dnn_based_source_separation_tpu.models import ConvTasNet

    return ConvTasNet(
        n_basis=n_basis, kernel_size=L, stride=S, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=16, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=2, sep_num_layers=3, causal=True, n_sources=2,
    )


@pytest.mark.parametrize("hop", [400, 160, 16])
def test_exact_streaming_matches_offline(hop):
    """Per-layer-state streaming must equal the offline causal forward to
    float rounding — cLN running stats, dilated-conv left contexts, encoder
    framing carry and decoder OLA tail all have to line up for this to
    hold (contrast the windowed wrapper's ~23 dB agreement above)."""
    import jax

    from dnn_based_source_separation_tpu.models.streaming import (
        ExactStreamingSeparator,
    )

    model = _causal_tiny()
    rng = np.random.default_rng(0)
    T = 1600  # grid-aligned: (T - L) % S == 0 and T % hop == 0
    x = rng.standard_normal((1, 1, T)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    offline = np.asarray(model.apply(variables, jnp.asarray(x)))[0]

    stream = ExactStreamingSeparator(model, variables, hop_samples=hop)
    outs = [stream.process(x[0, 0, lo : lo + hop]) for lo in range(0, T, hop)]
    outs.append(stream.flush())
    streamed = np.concatenate(outs, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_exact_streaming_reset_restarts_the_stream():
    import jax

    from dnn_based_source_separation_tpu.models.streaming import (
        ExactStreamingSeparator,
    )

    model = _causal_tiny()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 800)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    stream = ExactStreamingSeparator(model, variables, hop_samples=400)
    first = [stream.process(x[0, 0, lo : lo + 400]) for lo in range(0, 800, 400)]
    stream.reset()
    second = [stream.process(x[0, 0, lo : lo + 400]) for lo in range(0, 800, 400)]
    for a, b in zip(first, second):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_exact_streaming_rejects_noncausal_and_bad_hop():
    import jax

    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.models.streaming import (
        ExactStreamingSeparator,
    )

    causal = _causal_tiny()
    x = jnp.zeros((1, 1, 400))
    v = causal.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError):
        ExactStreamingSeparator(causal, v, hop_samples=12)  # not multiple of S

    noncausal = ConvTasNet(
        n_basis=16, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=16, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=2, causal=False, n_sources=2,
    )
    v2 = noncausal.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError):
        ExactStreamingSeparator(noncausal, v2, hop_samples=400)


def test_exact_streaming_lstm_tasnet_matches_offline():
    """Second causal family: stacked unidirectional LSTMs carry (h, c) in
    the 'stream' collection (ops/rnn.py), composing with the same wrapper."""
    import jax

    from dnn_based_source_separation_tpu.models import LSTMTasNet
    from dnn_based_source_separation_tpu.models.streaming import (
        ExactStreamingSeparator,
    )

    model = LSTMTasNet(
        n_basis=24, kernel_size=40, stride=20, enc_basis="trainable",
        dec_basis="trainable", sep_num_blocks=2, sep_num_layers=2,
        sep_hidden_channels=16, mask_nonlinear="softmax",
        causal=True, n_sources=2,
    )
    rng = np.random.default_rng(2)
    hop, T = 400, 4000
    x = rng.standard_normal((1, 1, T)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    offline = np.asarray(model.apply(variables, jnp.asarray(x)))[0]

    stream = ExactStreamingSeparator(model, variables, hop_samples=hop)
    outs = [stream.process(x[0, 0, lo : lo + hop]) for lo in range(0, T, hop)]
    outs.append(stream.flush())
    np.testing.assert_allclose(np.concatenate(outs, -1), offline, atol=1e-5)


def test_exact_streaming_rejects_utterance_global_encoder():
    """trainableGated L2-normalizes over the whole utterance — not
    frame-local, so exact streaming must refuse it rather than drift."""
    import jax

    from dnn_based_source_separation_tpu.models import LSTMTasNet
    from dnn_based_source_separation_tpu.models.streaming import (
        ExactStreamingSeparator,
    )

    model = LSTMTasNet(
        n_basis=24, kernel_size=40, stride=20, enc_basis="trainableGated",
        dec_basis="trainable", sep_num_blocks=1, sep_num_layers=1,
        sep_hidden_channels=8, causal=True, n_sources=2,
    )
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 400)))
    with pytest.raises(NotImplementedError):
        ExactStreamingSeparator(model, v, hop_samples=400)


def test_streaming_state_never_leaks_into_checkpoints():
    """model.init must NOT create 'stream' variables (they exist only under
    an explicitly-mutable streaming apply) — otherwise every checkpoint and
    train-step variables dict would grow stream state and training would
    carry normalization stats across batches."""
    import jax

    from dnn_based_source_separation_tpu.models import LSTMTasNet

    conv = _causal_tiny()
    v1 = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 400)))
    assert set(v1.keys()) == {"params"}

    lstm = LSTMTasNet(
        n_basis=24, kernel_size=40, stride=20, enc_basis="trainable",
        dec_basis="trainable", sep_num_blocks=1, sep_num_layers=1,
        sep_hidden_channels=8, causal=True, n_sources=2,
    )
    v2 = lstm.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 400)))
    assert set(v2.keys()) == {"params"}

    # Offline apply with those variables is the plain (stateless) path.
    out = conv.apply(v1, jnp.zeros((1, 1, 400)))
    assert out.shape == (1, 2, 400)


def test_exact_streaming_finish_handles_off_grid_lengths():
    """finish() frames exactly the remaining samples: an input that is off
    both the hop grid and (after offline-style padding) ends mid-hop must
    still match offline — zero-padding the tail to a whole hop would add
    frames that see real samples through their window and corrupt the
    final kernel-stride samples."""
    import jax

    from dnn_based_source_separation_tpu.models.streaming import (
        ExactStreamingSeparator,
    )

    model = _causal_tiny()
    L, S, hop = 16, 8, 400
    rng = np.random.default_rng(7)
    T = 1842  # arbitrary off-grid length
    x = rng.standard_normal((1, 1, T)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    offline = np.asarray(model.apply(variables, jnp.asarray(x)))[0]

    grid_pad = (S - (T - L) % S) % S
    pl = grid_pad // 2
    xp = np.concatenate([np.zeros(pl, np.float32), x[0, 0],
                         np.zeros(grid_pad - pl, np.float32)])
    stream = ExactStreamingSeparator(model, variables, hop_samples=hop)
    n_full = len(xp) // hop
    outs = [stream.process(xp[None, lo : lo + hop])
            for lo in range(0, n_full * hop, hop)]
    outs.append(stream.finish(xp[None, n_full * hop :]))
    est = np.concatenate(outs, axis=-1)[:, pl : pl + T]
    np.testing.assert_allclose(est, offline, atol=1e-5)
