"""Long-form chunked-scan inference tests."""
import numpy as np
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
