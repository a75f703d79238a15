"""Coverage tests for pools, activations, mu-law, metric-learn, transforms."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.criterion import ContrastiveLoss, TripletLoss, arcface_logits
from dnn_based_source_separation_tpu.ops import (
    GeneralizedMeanPool,
    ModReLU,
    complex_relu,
    concat_relu,
    global_avg_pool,
    global_max_pool,
    median_pool1d,
    zrelu,
)
from dnn_based_source_separation_tpu.transforms import minimum_phase, real_cepstrum
from dnn_based_source_separation_tpu.utils.audio import (
    inv_mu_law_compand,
    mu_law_compand,
    mu_law_decode,
    mu_law_encode,
)


def test_pools():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 4)), jnp.float32)
    assert global_avg_pool(x).shape == (2, 4)
    assert global_max_pool(x).shape == (2, 4)
    m = median_pool1d(x, kernel_size=4, stride=2)
    assert m.shape == (2, 4, 4)

    gem = GeneralizedMeanPool()
    v = gem.init(jax.random.PRNGKey(0), jnp.abs(x))
    assert gem.apply(v, jnp.abs(x)).shape == (2, 4)


def test_complex_activations():
    z = jnp.asarray([1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j], jnp.complex64)
    zr = zrelu(z)
    np.testing.assert_allclose(np.asarray(zr), [1 + 1j, 0, 0, 0])
    cr = complex_relu(z)
    np.testing.assert_allclose(np.asarray(cr), [1 + 1j, 1j, 1, 0])
    x = jnp.asarray([-1.0, 2.0])
    np.testing.assert_allclose(np.asarray(concat_relu(x)), [0, 2, 1, 0])

    mod = ModReLU(features=4)
    v = mod.init(jax.random.PRNGKey(0), z)
    out = mod.apply(v, z)
    assert out.shape == z.shape


def test_mu_law_roundtrip():
    x = np.linspace(-0.99, 0.99, 101).astype(np.float32)
    y = inv_mu_law_compand(mu_law_compand(x))
    np.testing.assert_allclose(y, x, atol=1e-5)
    idx = mu_law_encode(x)
    assert idx.min() >= 0 and idx.max() <= 255
    back = mu_law_decode(idx)
    np.testing.assert_allclose(back, x, atol=0.05)


def test_metric_learning_losses():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    p = a + 0.01
    n = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    tl = TripletLoss(margin=1.0)
    assert float(tl(a, p, n)) < float(tl(a, n, p))

    cl = ContrastiveLoss(margin=1.0)
    same = float(cl(a, p, jnp.ones(4)))
    diff_far = float(cl(a, a + 100.0, jnp.zeros(4)))
    assert same < 0.1 and diff_far < 1e-6

    w = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    logits = arcface_logits(a, w, labels)
    assert logits.shape == (4, 5)


def test_cepstrum_and_minimum_phase():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(64), jnp.float32)
    c = real_cepstrum(x)
    assert c.shape == (64,)
    mp = minimum_phase(x)
    # Same magnitude spectrum.
    np.testing.assert_allclose(
        np.abs(np.fft.rfft(np.asarray(mp))), np.abs(np.fft.rfft(np.asarray(x))),
        rtol=1e-3, atol=1e-3,
    )


def test_attn_mask_torch_convention():
    """attn_mask follows torch nn.MultiheadAttention: True = masked.

    Parity-checked directly against torch on the same weights.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    from dnn_based_source_separation_tpu.hub import dense_weight
    from dnn_based_source_separation_tpu.ops.attention import MultiheadAttention

    torch.manual_seed(11)
    E, h, B, T = 8, 2, 2, 5
    ref = torch.nn.MultiheadAttention(E, h, batch_first=True)
    x = torch.randn(B, T, E)
    mask = torch.zeros(T, T, dtype=torch.bool)
    mask[:, -2:] = True  # nobody attends to the last two positions
    expected, _ = ref(x, x, x, attn_mask=mask)

    model = MultiheadAttention(E, h)
    sd = ref.state_dict()
    params = {"params": {
        "in_proj": {"kernel": jnp.asarray(dense_weight(sd["in_proj_weight"])),
                    "bias": jnp.asarray(sd["in_proj_bias"].numpy())},
        "out_proj": {"kernel": jnp.asarray(dense_weight(sd["out_proj.weight"])),
                     "bias": jnp.asarray(sd["out_proj.bias"].numpy())},
    }}
    ours = model.apply(params, jnp.asarray(x.numpy()), attn_mask=jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours), expected.detach().numpy(), atol=1e-5)


def test_depthwise_shift_matches_grouped_conv():
    """DepthwiseConv1dShift == nn.Conv(feature_group_count=C), same pytree.

    The TDCN's stride-1 dilated depthwise convs auto-dispatch to the
    shift-multiply lowering (models/tdcn.py); this pins the exact
    functional + parameter-pytree equivalence that makes checkpoints
    interchangeable between the two lowerings.
    """
    import flax.linen as nn

    from dnn_based_source_separation_tpu.models.tdcn import DepthwiseConv1dShift

    C, K, d, T = 12, 3, 4, 40
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, T + (K - 1) * d, C)), jnp.float32)
    shift = DepthwiseConv1dShift(in_channels=C, kernel_size=K, dilation=d)
    conv = nn.Conv(features=C, kernel_size=(K,), strides=(1,),
                   kernel_dilation=(d,), feature_group_count=C, padding="VALID")
    v = shift.init(jax.random.PRNGKey(0), x)
    vc = conv.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v)
            == jax.tree_util.tree_map(lambda a: a.shape, vc))
    np.testing.assert_allclose(np.asarray(shift.apply(v, x)),
                               np.asarray(conv.apply(v, x)),
                               rtol=1e-6, atol=1e-6)


def test_tdcn_remat_matches_baseline():
    """sep_remat block/dots: identical forward AND gradients vs no remat."""
    from dnn_based_source_separation_tpu.models import ConvTasNet

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 1, 800)), jnp.float32)

    def build(mode):
        return ConvTasNet(
            n_basis=16, kernel_size=16, stride=8, enc_basis="trainable",
            dec_basis="trainable", sep_hidden_channels=12,
            sep_bottleneck_channels=8, sep_skip_channels=8,
            sep_num_blocks=2, sep_num_layers=2, causal=False, n_sources=2,
            sep_remat=mode)

    base = build("none")
    v = base.init(jax.random.PRNGKey(0), x)

    def loss(model, v):
        return jnp.sum(jnp.square(model.apply(v, x)))

    l0, g0 = jax.value_and_grad(lambda v: loss(base, v))(v)
    for mode in ("block", "dots"):
        m = build(mode)
        l1, g1 = jax.value_and_grad(lambda v: loss(m, v))(v)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4), g0, g1)


def test_gln_custom_vjp_matches_autodiff():
    """global_layer_norm's fused backward == autodiff of the plain form."""
    from dnn_based_source_separation_tpu.ops.norms import global_layer_norm

    def plain(x, gamma, beta, eps=1e-8):
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(-2, -1), keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + eps) + beta

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 17, 9)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(9), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(9), jnp.float32)

    def agg(fn):
        def f(x, gamma, beta):
            y = fn(x, gamma, beta)
            return jnp.sum(jnp.sin(y))
        return jax.grad(f, argnums=(0, 1, 2))(x, gamma, beta)

    for a, b in zip(agg(global_layer_norm), agg(plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
