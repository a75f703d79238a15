"""Wavesplit tests: stacks, oracle/inference paths, speaker loss."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models.wavesplit import (
    WaveSplit,
    speaker_distance_loss,
)


def tiny():
    return WaveSplit(
        latent_dim=8, n_sources=2, n_training_sources=5,
        spk_num_layers=3, sep_num_blocks=1, sep_num_layers=2,
    )


def test_wavesplit_inference_path():
    model = tiny()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 128)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 2, 128)


def test_wavesplit_oracle_path_and_layers():
    model = tiny()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1, 64)), jnp.float32)
    sorted_idx = jnp.zeros((2, 64, 2), jnp.int32).at[..., 1].set(1)
    vars_ = model.init(jax.random.PRNGKey(0), x, sorted_idx)
    y, v = model.apply(vars_, x, sorted_idx, return_spk_vector=True)
    assert y.shape == (2, 2, 64)
    assert v.shape == (2, 64, 2, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-4)

    all_layers = model.apply(vars_, x, sorted_idx, return_all_layers=True)
    assert all_layers.shape == (2, 2, 2, 64)  # (B, blocks*layers, n_src, T)


def test_speaker_distance_loss_prefers_correct_embeddings():
    rng = np.random.default_rng(2)
    B, T, S, D = 2, 10, 2, 6
    table = rng.standard_normal((5, D)).astype(np.float32)
    spk_emb = table[:S][None].repeat(B, axis=0)  # target speakers 0, 1
    # Vectors exactly at the embeddings, unpermuted
    v = np.broadcast_to(spk_emb[:, None], (B, T, S, D)).copy()
    loss_good, idx = speaker_distance_loss(
        jnp.asarray(v), jnp.asarray(spk_emb), jnp.asarray(table), None
    )
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [0, 1])

    # Swapped vectors must be detected by the per-frame PIT.
    v_swapped = v[:, :, ::-1]
    loss_sw, idx_sw = speaker_distance_loss(
        jnp.asarray(v_swapped), jnp.asarray(spk_emb), jnp.asarray(table), None
    )
    np.testing.assert_array_equal(np.asarray(idx_sw)[0, 0], [1, 0])
    np.testing.assert_allclose(np.asarray(loss_good), np.asarray(loss_sw), atol=1e-5)


def test_speaker_sorting_aligns_vectors_to_embeddings_3src():
    """For n_sources=3 the winning permutation must be INVERTED before
    gathering: sorted_idx[o] = which vector belongs to embedding row o
    (review finding: a 3-cycle exposed the non-inverted gather)."""
    import jax.numpy as jnp

    from dnn_based_source_separation_tpu.models.wavesplit import (
        speaker_distance_loss,
    )

    rng = np.random.default_rng(0)
    B, T, S, D = 1, 4, 3, 8
    base = rng.standard_normal((S, D)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    v = jnp.asarray(np.broadcast_to(base, (B, T, S, D)))
    # Embedding row o holds the vector of source (o+1) % 3 -> the optimal
    # assignment is a 3-cycle (not self-inverse).
    emb = jnp.asarray(np.roll(base, -1, axis=0))[None]  # (1, S, D)
    all_emb = emb[0]

    _, sorted_idx = speaker_distance_loss(v, emb, all_emb, None)
    onehot = jax.nn.one_hot(sorted_idx, S, dtype=v.dtype)
    sorted_v = jnp.einsum("btos,btsd->btod", onehot, v)
    np.testing.assert_allclose(
        np.asarray(sorted_v), np.broadcast_to(np.asarray(emb)[:, None], sorted_v.shape),
        atol=1e-6)
