"""Whole-model forward parity against the ACTUAL reference torch code.

These tests import the reference implementation from /root/reference/src,
build small reference models, convert their real state_dicts through the
hub converters, and assert the flax forward matches the torch forward on
random audio. This is the honest proxy for the <0.1 dB conversion north
star: any drift in epsilons, padding conventions, gate order, or mask
application fails here, not just structurally.

The reference package is imported read-only (torchaudio, which it imports
at module scope but never uses on these paths, is stubbed out).
"""
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE_SRC = "/root/reference/src"

ATOL = 1e-4


@pytest.fixture(scope="module")
def reference_src():
    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip("reference source tree not available")
    if "torchaudio" not in sys.modules:
        stub = types.ModuleType("torchaudio")
        stub.transforms = types.ModuleType("torchaudio.transforms")
        stub.functional = types.ModuleType("torchaudio.functional")
        sys.modules["torchaudio"] = stub
        sys.modules["torchaudio.transforms"] = stub.transforms
        sys.modules["torchaudio.functional"] = stub.functional
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    yield REFERENCE_SRC


def _to_jax(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def _max_err(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_conv_tasnet_forward_parity(reference_src):
    from models.conv_tasnet import ConvTasNet as RefConvTasNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_conv_tasnet
    from dnn_based_source_separation_tpu.models import ConvTasNet

    torch.manual_seed(0)
    kwargs = dict(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=12, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_kernel_size=3, sep_num_blocks=2, sep_num_layers=2,
        causal=False, n_sources=2,
    )
    ref = RefConvTasNet(**kwargs).eval()
    config = ref.get_config()

    x = torch.randn(2, 1, 320)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = ConvTasNet(**kwargs)
    params = _to_jax(convert_conv_tasnet(dict(ref.state_dict()), config))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_conv_tasnet_causal_forward_parity(reference_src):
    """Causal variant exercises cLN instead of gLN."""
    from models.conv_tasnet import ConvTasNet as RefConvTasNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_conv_tasnet
    from dnn_based_source_separation_tpu.models import ConvTasNet

    torch.manual_seed(1)
    kwargs = dict(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=12, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_kernel_size=3, sep_num_blocks=2, sep_num_layers=2,
        causal=True, n_sources=2,
    )
    ref = RefConvTasNet(**kwargs).eval()
    x = torch.randn(1, 1, 320)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = ConvTasNet(**kwargs)
    params = _to_jax(convert_conv_tasnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_dprnn_tasnet_forward_parity(reference_src):
    from models.dprnn_tasnet import DPRNNTasNet as RefDPRNNTasNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_dprnn_tasnet
    from dnn_based_source_separation_tpu.models import DPRNNTasNet

    torch.manual_seed(2)
    kwargs = dict(
        n_basis=16, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=8, sep_hidden_channels=6,
        sep_chunk_size=10, sep_hop_size=5, sep_num_blocks=2,
        causal=False, n_sources=2,
    )
    ref = RefDPRNNTasNet(**kwargs).eval()
    x = torch.randn(1, 1, 160)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = DPRNNTasNet(**kwargs)
    params = _to_jax(convert_dprnn_tasnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_open_unmix_forward_parity(reference_src):
    from models.umx import OpenUnmix as RefOpenUnmix

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_open_unmix
    from dnn_based_source_separation_tpu.models import OpenUnmix

    torch.manual_seed(3)
    n_bins, max_bin, H = 33, 24, 16
    ref = RefOpenUnmix(
        in_channels=2, hidden_channels=H, num_layers=2,
        n_bins=n_bins, max_bin=max_bin, dropout=0.0, causal=False,
    ).eval()
    x = torch.rand(2, 2, n_bins, 20)  # non-negative amplitude
    with torch.no_grad():
        expected = ref(x).numpy()

    model = OpenUnmix(
        in_channels=2, hidden_channels=H, num_layers=2,
        n_bins=n_bins, max_bin=max_bin, dropout=0.0, causal=False,
    )
    params = _to_jax(convert_open_unmix(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_dptnet_forward_parity(reference_src):
    from models.dptnet import DPTNet as RefDPTNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_dptnet
    from dnn_based_source_separation_tpu.models.dptnet import DPTNet

    torch.manual_seed(4)
    kwargs = dict(
        n_basis=16, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=8, sep_hidden_channels=6,
        sep_chunk_size=10, sep_hop_size=5, sep_num_blocks=2,
        sep_num_heads=2, causal=False, n_sources=2,
    )
    ref = RefDPTNet(**kwargs).eval()
    x = torch.randn(1, 1, 160)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = DPTNet(**kwargs)
    params = _to_jax(convert_dptnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_sepformer_forward_parity(reference_src):
    from models.sepformer import SepFormer as RefSepFormer

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_sepformer
    from dnn_based_source_separation_tpu.models import SepFormer

    torch.manual_seed(5)
    kwargs = dict(
        n_basis=16, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=8,
        sep_chunk_size=10, sep_hop_size=5, sep_num_blocks=1,
        sep_num_layers_intra=2, sep_num_layers_inter=2,
        sep_num_heads_intra=2, sep_num_heads_inter=2,
        sep_d_ff_intra=16, sep_d_ff_inter=16,
        sep_dropout=0.0, causal=False, n_sources=2,
    )
    ref = RefSepFormer(**kwargs).eval()
    x = torch.randn(1, 1, 160)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = SepFormer(**{k: v for k, v in kwargs.items() if k != "sep_dropout"})
    params = _to_jax(convert_sepformer(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_danet_forward_parity(reference_src):
    from models.danet import DANet as RefDANet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_danet
    from dnn_based_source_separation_tpu.models.danet import DANet

    torch.manual_seed(6)
    n_bins, D = 17, 5
    ref = RefDANet(n_bins, embed_dim=D, hidden_channels=12, num_blocks=2,
                   dropout=0, causal=False).eval()
    x = torch.rand(1, 1, n_bins, 9)
    assignment = torch.zeros(1, 2, n_bins, 9)
    assignment[:, 0, : n_bins // 2] = 1.0
    assignment[:, 1, n_bins // 2 :] = 1.0
    threshold_weight = torch.ones(1, 1, n_bins, 9)
    with torch.no_grad():
        expected = ref(x, assignment=assignment, threshold_weight=threshold_weight).numpy()

    model = DANet(n_bins=n_bins, embed_dim=D, hidden_channels=12, num_blocks=2,
                  causal=False)
    params = _to_jax(convert_danet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()),
                       assignment=jnp.asarray(assignment.numpy()),
                       threshold_weight=jnp.asarray(threshold_weight.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_adanet_forward_parity(reference_src):
    from models.adanet import ADANet as RefADANet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_adanet
    from dnn_based_source_separation_tpu.models.adanet import ADANet

    torch.manual_seed(7)
    n_bins, D = 17, 5
    ref = RefADANet(n_bins, embed_dim=D, hidden_channels=12, num_blocks=2,
                    num_anchors=4, dropout=0, causal=False).eval()
    x = torch.rand(1, 1, n_bins, 9)
    with torch.no_grad():
        expected = ref(x, n_sources=2).numpy()

    model = ADANet(n_bins=n_bins, embed_dim=D, hidden_channels=12, num_blocks=2,
                   num_anchors=4, causal=False)
    params = _to_jax(convert_adanet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()), n_sources=2)
    assert _max_err(ours, expected) < ATOL


def test_galrnet_forward_parity(reference_src):
    from models.galrnet import GALRNet as RefGALRNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_galrnet
    from dnn_based_source_separation_tpu.models.galrnet import GALRNet

    torch.manual_seed(8)
    kwargs = dict(
        n_basis=16, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=8, sep_chunk_size=10, sep_hop_size=5,
        sep_num_blocks=2, sep_num_heads=2, sep_dropout=0.0,
        low_dimension=False, causal=False, n_sources=2,
    )
    ref = RefGALRNet(**kwargs).eval()
    x = torch.randn(1, 1, 160)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = GALRNet(**{k: v for k, v in kwargs.items() if k != "sep_dropout"})
    params = _to_jax(convert_galrnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_d3net_forward_parity(reference_src):
    """Exercises BatchNorm running stats AND the ConvTranspose2d kernel flip."""
    from models.d3net import D3Net as RefD3Net

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_d3net
    from dnn_based_source_separation_tpu.models import D3Net

    torch.manual_seed(9)
    band = lambda v: {"low": v, "middle": v, "full": v}
    growth_rate = {"low": [2, 3, 2], "middle": [2, 2, 2], "full": [2, 3, 2]}
    common = dict(
        in_channels=2,
        num_features=band(4),
        growth_rate=growth_rate,
        kernel_size=band(3),
        bands=["low", "middle"], sections=[16, 16],
        scale=band((2, 2)),
        num_d2blocks=band([2, 2, 2]), depth=band([2, 2, 2]),
        dilated=band([True] * 3), norm=band([True] * 3), nonlinear=band(["relu"] * 3),
        growth_rate_final=3, kernel_size_final=3, depth_final=2,
    )
    ref = RefD3Net(**common).eval()
    x = torch.rand(1, 2, 32, 16)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = D3Net(**common)
    variables = _to_jax(convert_d3net(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_lstm_tasnet_forward_parity(reference_src):
    from models.tasnet import TasNet as RefTasNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_lstm_tasnet
    from dnn_based_source_separation_tpu.models.lstm_tasnet import LSTMTasNet

    torch.manual_seed(10)
    kwargs = dict(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainableGated",
        dec_basis="trainable", sep_num_blocks=2, sep_num_layers=1,
        sep_hidden_channels=12, causal=False, n_sources=2,
    )
    ref = RefTasNet(**kwargs).eval()
    x = torch.randn(2, 1, 160)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = LSTMTasNet(**kwargs)
    params = _to_jax(convert_lstm_tasnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_xumx_forward_parity(reference_src):
    from models.xumx import CrossNetOpenUnmix as RefXUMX

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_xumx
    from dnn_based_source_separation_tpu.models.xumx import CrossNetOpenUnmix

    torch.manual_seed(11)
    kwargs = dict(
        in_channels=2, hidden_channels=12, num_layers=2,
        n_bins=17, max_bin=12, dropout=0.0, causal=False,
        sources=["drums", "bass"],
    )
    ref = RefXUMX(**kwargs).eval()
    x = torch.rand(2, 1, 2, 17, 9)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = CrossNetOpenUnmix(**{**kwargs, "sources": tuple(kwargs["sources"])})
    variables = _to_jax(convert_xumx(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_mm_densenet_forward_parity(reference_src):
    from models.mm_densenet import MMDenseNet as RefMMDenseNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_mm_densenet
    from dnn_based_source_separation_tpu.models import MMDenseNet

    torch.manual_seed(12)
    band = lambda v: {"low": v, "middle": v, "full": v}
    common = dict(
        in_channels=2,
        num_features=band(4),
        growth_rate={"low": [2, 3, 2], "middle": [2, 2, 2], "full": [2, 3, 2]},
        kernel_size=band(3),
        bands=["low", "middle"], sections=[16, 16],
        scale=band((2, 2)),
        dilated=band([False] * 3), norm=band([True] * 3), nonlinear=band(["relu"] * 3),
        depth=band([2, 2, 2]),
        growth_rate_final=3, kernel_size_final=3, depth_final=2,
    )
    ref = RefMMDenseNet(**common).eval()
    x = torch.rand(1, 2, 32, 16)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = MMDenseNet(**common)
    variables = _to_jax(convert_mm_densenet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_mm_dense_lstm_forward_parity(reference_src):
    """RNN in the bottleneck, decoder, and final block (parallel position)."""
    from models.mm_dense_lstm import MMDenseLSTM as RefMMDenseLSTM

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_mm_dense_rnn
    from dnn_based_source_separation_tpu.models import MMDenseLSTM

    torch.manual_seed(13)
    band = lambda v: {"low": v, "middle": v, "full": v}
    common = dict(
        in_channels=2,
        num_features=band(4),
        growth_rate={"low": [2, 3, 2], "middle": [2, 2, 2],
                     "full": [2, 2, 2, 2, 2]},
        hidden_channels={"low": [0, 3, 0], "middle": [0, 3, 0],
                         "full": [0, 0, 3, 2, 0]},
        kernel_size=band(3),
        bands=["low", "middle"], sections=[16, 16],
        scale=band((2, 2)),
        dilated={"low": [False] * 3, "middle": [False] * 3, "full": [False] * 5},
        norm={"low": [True] * 3, "middle": [True] * 3, "full": [True] * 5},
        nonlinear={"low": ["relu"] * 3, "middle": ["relu"] * 3, "full": ["relu"] * 5},
        depth={"low": [2, 2, 2], "middle": [2, 2, 2], "full": [2] * 5},
        causal=False,
        # hidden_channels_final must be 0: the reference head BN is sized
        # to growth_rate_final only (all paper configs use 0 here).
        growth_rate_final=3, hidden_channels_final=0,
        kernel_size_final=3, depth_final=2,
    )
    ref = RefMMDenseLSTM(**{**common, "rnn_position": "parallel"}).eval()
    x = torch.rand(1, 2, 32, 16)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = MMDenseLSTM(**common, rnn_position="parallel")
    variables = _to_jax(convert_mm_dense_rnn(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_mrx_forward_parity(reference_src):
    from models.mrx import MultiResolutionCrossNet as RefMRX

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_mrx
    from dnn_based_source_separation_tpu.models.mrx import MultiResolutionCrossNet

    torch.manual_seed(14)
    ref = RefMRX(2, hidden_channels=12, num_layers=2, n_fft=[32, 64],
                 hop_length=16, sources=["music", "speech"]).eval()
    x = torch.randn(1, 1, 2, 800)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = MultiResolutionCrossNet(
        in_channels=2, hidden_channels=12, num_layers=2, n_fft=(32, 64),
        hop_length=16, sources=("music", "speech"),
    )
    variables = _to_jax(convert_mrx(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()[:, 0]))
    assert _max_err(ours, expected.squeeze(0)[None] if expected.ndim == 3 else expected) < ATOL


def test_checkpoint_dispatch_new_families(reference_src, tmp_path):
    """build_from_torch_checkpoint routes reference checkpoints of the new
    families to the right architecture and reproduces the torch forward."""
    from models.tasnet import TasNet as RefTasNet
    from models.xumx import CrossNetOpenUnmix as RefXUMX

    from dnn_based_source_separation_tpu.hub import build_from_torch_checkpoint
    from dnn_based_source_separation_tpu.models.lstm_tasnet import LSTMTasNet
    from dnn_based_source_separation_tpu.models.xumx import CrossNetOpenUnmix

    torch.manual_seed(15)
    ref = RefTasNet(n_basis=16, kernel_size=8, stride=4,
                    enc_basis="trainableGated", dec_basis="trainable",
                    sep_num_blocks=2, sep_num_layers=1,
                    sep_hidden_channels=12, causal=False, n_sources=2).eval()
    pkg = ref.get_config()
    pkg["state_dict"] = ref.state_dict()
    torch.save(pkg, tmp_path / "tasnet.pth")
    model, params = build_from_torch_checkpoint(str(tmp_path / "tasnet.pth"))
    assert isinstance(model, LSTMTasNet)
    x = torch.randn(1, 1, 160)
    with torch.no_grad():
        expected = ref(x).numpy()
    ours = model.apply(_to_jax(params), jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL

    ref = RefXUMX(in_channels=2, hidden_channels=12, num_layers=2,
                  n_bins=17, max_bin=12, dropout=0.0, causal=False,
                  sources=["drums", "bass"]).eval()
    pkg = ref.get_config()
    pkg["n_bins"], pkg["max_bin"] = 17, 12
    pkg["state_dict"] = ref.state_dict()
    torch.save(pkg, tmp_path / "xumx.pth")
    model, variables = build_from_torch_checkpoint(str(tmp_path / "xumx.pth"))
    assert isinstance(model, CrossNetOpenUnmix)
    x = torch.rand(1, 1, 2, 17, 9)
    with torch.no_grad():
        expected = ref(x).numpy()
    ours = model.apply(_to_jax(variables), jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL


def test_additive_angular_margin_loss_matches_reference(reference_src):
    from criterion.metric_learn import AdditiveAngularMarginLoss as TorchAAM

    from dnn_based_source_separation_tpu.criterion import AdditiveAngularMarginLoss

    rng = np.random.default_rng(0)
    cos = np.clip(rng.uniform(-0.99, 0.99, (6, 5)).astype(np.float32), -0.99, 0.99)
    target = rng.integers(0, 5, (6,))

    for easy in (False, True):
        t_loss = TorchAAM(scale=30.0, margin=0.5, easy_margin=easy)(
            torch.from_numpy(cos), torch.from_numpy(target).long())
        j_loss = AdditiveAngularMarginLoss(scale=30.0, margin=0.5, easy_margin=easy)(
            jnp.asarray(cos), jnp.asarray(target))
        np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)


def test_tdc2d_forward_parity(reference_src):
    """cunet_choi TDC dense block vs reference src/models/cunet.py TDC2d.

    Note: the reference TDCTransformBlock2d computes its nonlinearity into
    a dead variable and forwards the BN output (`x`, cunet.py:593-601), so
    the comparable configuration here is nonlinear=None.
    """
    from models.cunet import TDC2d as RefTDC2d

    from dnn_based_source_separation_tpu.models.cunet_choi import TDC2d

    torch.manual_seed(0)
    in_ch, growth, k, layers = 5, 6, 3, 3
    ref = RefTDC2d(in_ch, growth, kernel_size=k, num_layers=layers,
                   nonlinear="relu")
    # Populate non-trivial BN running stats before comparing in eval mode.
    with torch.no_grad():
        ref.train()
        ref(torch.randn(2, in_ch, 16, 7))
        ref.eval()

    ours = TDC2d(growth_rate=growth, kernel_size=k, num_layers=layers,
                 nonlinear=None)
    B, F, T = 2, 16, 7
    x = np.random.default_rng(0).standard_normal((B, in_ch, F, T)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params, stats = {}, {}
    cur = in_ch
    for i in range(layers):
        blk = ref.net[i]
        w = blk.conv1d.weight.detach().numpy()  # (out, in, k)
        params[f"conv{i}"] = {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0))[:, None])}
        bn = blk.norm1d
        params[f"norm{i}"] = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
        }
        stats[f"norm{i}"] = {
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy()),
        }
        cur += growth

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # channels-last
    got = ours.apply({"params": params, "batch_stats": stats}, xj, train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert _max_err(got, want) < ATOL


def test_build_from_pretrained_layout(reference_src, tmp_path):
    """The hub's offline pretrained flow: a reference-format .pth placed in
    the PRETRAINED.md directory layout loads, converts, and runs, matching
    the torch forward."""
    from models.conv_tasnet import ConvTasNet as RefConvTasNet

    from dnn_based_source_separation_tpu.hub.pretrained import build_from_pretrained

    torch.manual_seed(1)
    kwargs = dict(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=12, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_kernel_size=3, sep_num_blocks=2, sep_num_layers=2,
        causal=False, n_sources=2,
    )
    ref = RefConvTasNet(**kwargs).eval()

    # Reference checkpoint format: config dict + state_dict in one blob
    # (driver.py:208-226), saved under root/task/sr/<n>speakers/.
    d = tmp_path / "wsj0-mix" / "sr8000" / "2speakers"
    os.makedirs(d)
    blob = dict(ref.get_config())
    blob["state_dict"] = ref.state_dict()
    torch.save(blob, str(d / "best.pth"))

    model, params = build_from_pretrained(
        task="wsj0-mix", sample_rate=8000, n_sources=2, root=str(tmp_path))

    x = torch.randn(1, 1, 320)
    with torch.no_grad():
        expected = ref(x).numpy()
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL

    with pytest.raises(FileNotFoundError):
        build_from_pretrained(task="musdb18", root=str(tmp_path))


def test_densenet_forward_parity(reference_src):
    """Plain image-style DenseNet (reference src/models/densenet.py:11),
    including its keep-spatial-size padding rule and transitions."""
    from models.densenet import DenseNet as RefDenseNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_densenet
    from dnn_based_source_separation_tpu.models import DenseNet

    torch.manual_seed(7)
    kwargs = dict(in_channels=3, num_features=4, growth_rate=8,
                  kernel_size=(3, 5), stride=(1, 1), hidden_channels=16,
                  num_blocks=3, num_layers=[2, 3, 4])
    ref = RefDenseNet(**kwargs).eval()
    x = torch.randn(2, 3, 16, 32)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = DenseNet(**kwargs)
    params = _to_jax(convert_densenet(dict(ref.state_dict()), kwargs))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _max_err(ours, expected) < ATOL


def test_densenet_strided_layer_parity(reference_src):
    """stride=(2,2) exercises the reference's spatial-size-preserving pad."""
    from models.densenet import DenseNet as RefDenseNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_densenet
    from dnn_based_source_separation_tpu.models import DenseNet

    torch.manual_seed(8)
    kwargs = dict(in_channels=2, num_features=4, growth_rate=4,
                  kernel_size=(3, 3), stride=(2, 2), hidden_channels=8,
                  num_blocks=2, num_layers=2)
    ref = RefDenseNet(**kwargs).eval()
    x = torch.randn(1, 2, 12, 20)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = DenseNet(**kwargs)
    params = _to_jax(convert_densenet(dict(ref.state_dict()), kwargs))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _max_err(ours, expected) < ATOL


def test_mm_dense_lstm_rnn_only_bottleneck_parity(reference_src):
    """depth=0 + hidden>0 bottleneck = pure RNNBlock (reference
    m_dense_rnn.py:75-81) — used by the paper config's high band."""
    from models.mm_dense_lstm import MMDenseLSTM as RefMMDenseLSTM

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_mm_dense_rnn
    from dnn_based_source_separation_tpu.models import MMDenseLSTM

    torch.manual_seed(21)
    band = lambda v: {"low": v, "full": v}
    common = dict(
        in_channels=2,
        num_features=band(4),
        growth_rate={"low": [2, 2, 0, 2, 2], "full": [2, 3, 2]},
        hidden_channels={"low": [0, 0, 3, 0, 0], "full": [0, 2, 0]},
        kernel_size=band(3),
        bands=["low"], sections=[32],
        scale=band((2, 2)),
        dilated={"low": [False] * 5, "full": [False] * 3},
        norm={"low": [True] * 5, "full": [True] * 3},
        nonlinear={"low": ["relu"] * 5, "full": ["relu"] * 3},
        depth={"low": [1, 1, 0, 1, 1], "full": [2, 2, 2]},
        causal=False,
        growth_rate_final=3, hidden_channels_final=0,
        kernel_size_final=3, depth_final=2,
    )
    ref = RefMMDenseLSTM(**{**common, "rnn_position": "parallel"}).eval()
    x = torch.rand(1, 2, 32, 16)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = MMDenseLSTM(**common, rnn_position="parallel")
    variables = _to_jax(convert_mm_dense_rnn(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert _max_err(ours, expected) < ATOL
