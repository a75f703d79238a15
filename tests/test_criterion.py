"""Unit tests for the loss layer: SDR family, PIT/ORPIT/SinkPIT, combo, DC."""
import itertools

import numpy as np
import jax.numpy as jnp

from dnn_based_source_separation_tpu.criterion import (
    sisdr,
    sdr,
    SISDR,
    NegSISDR,
    PIT1d,
    ORPIT,
    SinkPIT,
    CombinationLoss,
    AffinityLoss,
    MSELoss,
)
from dnn_based_source_separation_tpu.criterion.pit import pit, orpit, sinkpit


def test_sisdr_scale_invariance():
    rng = np.random.default_rng(0)
    s = rng.standard_normal((2, 1000)).astype(np.float32)
    est = s + 0.1 * rng.standard_normal((2, 1000)).astype(np.float32)
    a = np.asarray(sisdr(jnp.asarray(est), jnp.asarray(s)))
    b = np.asarray(sisdr(jnp.asarray(est), jnp.asarray(5.0 * s)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_sdr_perfect_reconstruction_is_large():
    rng = np.random.default_rng(1)
    s = rng.standard_normal((2, 1000)).astype(np.float32)
    val = np.asarray(sdr(jnp.asarray(s), jnp.asarray(s)))
    assert np.all(val > 100.0)


def test_pit_matches_bruteforce():
    rng = np.random.default_rng(2)
    B, n, T = 4, 3, 500
    est = rng.standard_normal((B, n, T)).astype(np.float32)
    tgt = rng.standard_normal((B, n, T)).astype(np.float32)
    crit = NegSISDR()
    loss, pattern = pit(crit, jnp.asarray(est), jnp.asarray(tgt), batch_mean=False)
    loss = np.asarray(loss)

    # Brute force in numpy
    for b in range(B):
        best = np.inf
        for perm in itertools.permutations(range(n)):
            val = -np.mean(np.asarray(sisdr(jnp.asarray(est[b]), jnp.asarray(tgt[b, list(perm)]))))
            best = min(best, val)
        np.testing.assert_allclose(loss[b], best, rtol=1e-5)


def test_pit_picks_correct_permutation():
    rng = np.random.default_rng(3)
    B, n, T = 2, 2, 400
    src = rng.standard_normal((B, n, T)).astype(np.float32)
    est = src[:, ::-1].copy()  # swapped estimates
    pit_criterion = PIT1d(NegSISDR(), n_sources=n)
    loss, pattern = pit_criterion(jnp.asarray(est), jnp.asarray(src))
    assert float(loss) < -100.0  # perfect after permutation
    np.testing.assert_array_equal(np.asarray(pattern), np.array([[1, 0], [1, 0]]))


def test_orpit_selects_the_one():
    rng = np.random.default_rng(4)
    B, n_max, T = 3, 4, 300
    tgt = rng.standard_normal((B, n_max, T)).astype(np.float32)
    counts = np.array([2, 3, 4], dtype=np.int32)
    for b, c in enumerate(counts):
        tgt[b, c:] = 0.0
    # Estimates: "one" = source 1, "rest" = sum of the others (per count).
    one = tgt[:, 1]
    rest = np.stack([tgt[b, :c].sum(0) - tgt[b, 1] for b, c in enumerate(counts)])
    est = np.stack([one, rest], axis=1)
    loss, idx = orpit(NegSISDR(), jnp.asarray(est), jnp.asarray(tgt), n_sources=counts, batch_mean=False)
    np.testing.assert_array_equal(np.asarray(idx), np.ones(B))
    assert np.all(np.asarray(loss) < -100.0)


def test_sinkpit_approaches_pit_at_high_coldness():
    rng = np.random.default_rng(5)
    B, n, T = 2, 3, 256
    est = rng.standard_normal((B, n, T)).astype(np.float32)
    tgt = rng.standard_normal((B, n, T)).astype(np.float32)
    crit = NegSISDR()
    hard, _ = pit(crit, jnp.asarray(est), jnp.asarray(tgt))
    soft, P = sinkpit(crit, jnp.asarray(est), jnp.asarray(tgt), coldness=100.0, iteration=50)
    # Reference sinkpit SUMS over the n x n assignment (pit.py:185) while the
    # criterion's 'mean' reduction averages over sources -> soft ~= n * hard.
    np.testing.assert_allclose(float(soft) / n, float(hard), rtol=1e-2, atol=0.05)
    # Soft permutation should be (nearly) a permutation matrix.
    P = np.asarray(P)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=0.05)
    np.testing.assert_allclose(P.sum(axis=2), 1.0, atol=0.05)


def test_combination_loss_subsets():
    rng = np.random.default_rng(6)
    B, n, T = 2, 3, 128
    x = rng.standard_normal((B, n, T)).astype(np.float32)
    combo = CombinationLoss(MSELoss(), min_pair=1, max_pair=2)
    # identical input/target -> zero loss over every subset
    loss = combo(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_affinity_loss_zero_for_identical_partition():
    B, n_samples, C = 2, 40, 3
    rng = np.random.default_rng(7)
    labels = rng.integers(0, C, size=(B, n_samples))
    Y = np.eye(C, dtype=np.float32)[labels]
    loss = AffinityLoss()(jnp.asarray(Y), jnp.asarray(Y))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-4)

    V = rng.standard_normal((B, n_samples, 5)).astype(np.float32)
    loss2 = AffinityLoss()(jnp.asarray(V), jnp.asarray(Y))
    assert float(loss2) > 0.0


def test_mixit_matches_bruteforce():
    from dnn_based_source_separation_tpu.criterion import mixit

    rng = np.random.default_rng(8)
    B, M, n_mix, T = 3, 4, 2, 400
    est = rng.standard_normal((B, M, T)).astype(np.float32)
    mixes = rng.standard_normal((B, n_mix, T)).astype(np.float32)
    crit = NegSISDR()
    loss, assign = mixit(crit, jnp.asarray(est), jnp.asarray(mixes), batch_mean=False)
    loss, assign = np.asarray(loss), np.asarray(assign)

    for b in range(B):
        best = np.inf
        for a in itertools.product(range(n_mix), repeat=M):
            sums = np.zeros((n_mix, T), np.float32)
            for i, m in enumerate(a):
                sums[m] += est[b, i]
            val = float(np.mean([
                -np.mean(np.asarray(sisdr(jnp.asarray(sums[m][None]),
                                          jnp.asarray(mixes[b, m][None]))))
                for m in range(n_mix)
            ]))
            best = min(best, val)
        np.testing.assert_allclose(loss[b], best, rtol=1e-5)


def test_mixit_recovers_partition():
    """When the estimates ARE the constituent sources, the optimum routes
    each one back to its own mixture and the loss is near-perfect."""
    from dnn_based_source_separation_tpu.criterion import MixIT

    rng = np.random.default_rng(9)
    B, T = 2, 600
    s = rng.standard_normal((B, 4, T)).astype(np.float32)
    mix1 = s[:, 0] + s[:, 1]
    mix2 = s[:, 2] + s[:, 3]
    mixes = np.stack([mix1, mix2], axis=1)
    crit = MixIT(NegSISDR(), n_est=4, n_mix=2)
    loss, assign = crit(jnp.asarray(s), jnp.asarray(mixes))
    assert float(loss) < -100.0  # exact reconstruction after assignment
    np.testing.assert_array_equal(np.asarray(assign),
                                  np.tile([0, 0, 1, 1], (B, 1)))


def test_mixit_invariant_to_estimate_order():
    from dnn_based_source_separation_tpu.criterion import MixIT

    rng = np.random.default_rng(10)
    B, M, T = 2, 4, 300
    est = rng.standard_normal((B, M, T)).astype(np.float32)
    mixes = rng.standard_normal((B, 2, T)).astype(np.float32)
    crit = MixIT(NegSISDR(), n_est=M, n_mix=2)
    l1, _ = crit(jnp.asarray(est), jnp.asarray(mixes))
    perm = [2, 0, 3, 1]
    l2, _ = crit(jnp.asarray(est[:, perm]), jnp.asarray(mixes))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_mixit_jit_and_grad():
    import jax

    from dnn_based_source_separation_tpu.criterion import MixIT

    rng = np.random.default_rng(11)
    est = jnp.asarray(rng.standard_normal((2, 3, 200)), jnp.float32)
    mixes = jnp.asarray(rng.standard_normal((2, 2, 200)), jnp.float32)
    crit = MixIT(NegSISDR(), n_est=3, n_mix=2)

    loss_fn = jax.jit(lambda e: crit(e, mixes)[0])
    g = jax.grad(loss_fn)(est)
    assert np.isfinite(float(loss_fn(est)))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_hungarian_matches_exhaustive_pit():
    from dnn_based_source_separation_tpu.criterion import HungarianLoss

    rng = np.random.default_rng(13)
    for n in (2, 3, 4):
        B, T = 3, 300
        est = jnp.asarray(rng.standard_normal((B, n, T)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((B, n, T)), jnp.float32)
        l_pit, p_pit = pit(NegSISDR(), est, tgt, n_sources=n, batch_mean=False)
        l_hun, p_hun = HungarianLoss(NegSISDR())(est, tgt, batch_mean=False)
        np.testing.assert_allclose(np.asarray(l_hun), np.asarray(l_pit), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(p_hun), np.asarray(p_pit))


def test_hungarian_scales_past_exhaustive_range():
    """n=8 (8! = 40320 permutations — infeasible for table PIT) solves in
    one jitted call and finds the planted permutation."""
    import jax as _jax

    from dnn_based_source_separation_tpu.criterion import HungarianLoss

    rng = np.random.default_rng(14)
    B, n, T = 2, 8, 400
    src = rng.standard_normal((B, n, T)).astype(np.float32)
    perm = rng.permutation(n)
    est = jnp.asarray(src[:, perm])
    crit = HungarianLoss(NegSISDR())
    loss, pattern = _jax.jit(lambda e, t: crit(e, t))(est, jnp.asarray(src))
    assert float(loss) < -100.0  # exact recovery
    np.testing.assert_array_equal(np.asarray(pattern),
                                  np.tile(perm, (B, 1)))


def test_prob_pit_converges_to_pit_at_low_gamma():
    from dnn_based_source_separation_tpu.criterion import ProbPIT

    rng = np.random.default_rng(15)
    B, n, T = 3, 3, 300
    est = jnp.asarray(rng.standard_normal((B, n, T)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, n, T)), jnp.float32)
    l_pit, p_pit = pit(NegSISDR(), est, tgt, n_sources=n, batch_mean=False)
    l_prob, p_prob = ProbPIT(NegSISDR(), n_sources=n, gamma=1e-4)(
        est, tgt, batch_mean=False)
    np.testing.assert_allclose(np.asarray(l_prob), np.asarray(l_pit), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(p_prob), np.asarray(p_pit))


def test_prob_pit_matches_explicit_logsumexp():
    from dnn_based_source_separation_tpu.criterion import prob_pit
    from dnn_based_source_separation_tpu.criterion.pit import permutation_table

    rng = np.random.default_rng(16)
    B, n, T, gamma = 2, 3, 200, 0.7
    est = rng.standard_normal((B, n, T)).astype(np.float32)
    tgt = rng.standard_normal((B, n, T)).astype(np.float32)
    loss, _ = prob_pit(NegSISDR(), jnp.asarray(est), jnp.asarray(tgt),
                       gamma=gamma, batch_mean=False)

    pats = permutation_table(n)
    for b in range(B):
        vals = []
        for perm in pats:
            vals.append(-np.mean(np.asarray(
                sisdr(jnp.asarray(est[b]), jnp.asarray(tgt[b, list(perm)])))))
        vals = np.asarray(vals)
        expected = -gamma * (
            np.log(np.sum(np.exp(-vals / gamma))) - np.log(len(pats)))
        np.testing.assert_allclose(np.asarray(loss)[b], expected, rtol=1e-4)


def test_thresholded_snr_cap_and_monotonicity():
    from dnn_based_source_separation_tpu.criterion import thresholded_snr

    rng = np.random.default_rng(17)
    t = jnp.asarray(rng.standard_normal((2, 500)), jnp.float32)
    # Perfect estimate -> capped at +threshold_db (the paper's bound on
    # already-solved sources), not unbounded like raw SDR.
    hi = np.asarray(thresholded_snr(t, t, threshold_db=30.0))
    np.testing.assert_allclose(hi, 30.0, atol=1e-3)
    # Zero estimate sits near 0 dB (the threshold changes the top of the
    # range, not the bottom).
    lo = np.asarray(thresholded_snr(jnp.zeros_like(t), t, threshold_db=30.0))
    np.testing.assert_allclose(lo, 0.0, atol=0.01)
    # Monotone in reconstruction quality between those extremes.
    mid1 = np.asarray(thresholded_snr(
        t + 0.1 * jnp.asarray(rng.standard_normal((2, 500)), jnp.float32), t))
    mid2 = np.asarray(thresholded_snr(
        t + 0.5 * jnp.asarray(rng.standard_normal((2, 500)), jnp.float32), t))
    assert np.all(mid1 > mid2) and np.all(mid1 < 30.0) and np.all(mid2 > 0.0)


def test_mixit_thresholded_snr_prefers_proper_split():
    """With good (not perfect) estimates of all four sources, the optimum
    routes two to each mixture rather than hiding one behind an empty sum."""
    from dnn_based_source_separation_tpu.criterion import NegThresholdedSNR, mixit

    rng = np.random.default_rng(18)
    B, T = 2, 500
    s = rng.standard_normal((B, 4, T)).astype(np.float32)
    noise = 0.3 * rng.standard_normal((B, 4, T)).astype(np.float32)
    est = jnp.asarray(s + noise)
    mixes = jnp.asarray(np.stack([s[:, 0] + s[:, 1], s[:, 2] + s[:, 3]], axis=1))
    loss, assign = mixit(NegThresholdedSNR(), est, mixes, batch_mean=False)
    assign = np.asarray(assign)
    for b in range(B):
        assert set(assign[b]) == {0, 1}, f"degenerate routing: {assign[b]}"
