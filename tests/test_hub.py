"""Hub conversion tests: torch layer weights -> flax params parity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from dnn_based_source_separation_tpu.hub import (
    conv1d_weight,
    conv_transpose1d_weight,
    dense_weight,
    depthwise_conv1d_weight,
    lstm_params,
)
from dnn_based_source_separation_tpu.hub.torch_convert import encoder_conv1d_weight
from dnn_based_source_separation_tpu.ops.filterbank import ConvDecoder, ConvEncoder
from dnn_based_source_separation_tpu.ops.rnn import LSTM

import flax.linen as nn


def test_encoder_conv1d_parity():
    """torch Conv1d(stride=8, k=16, no bias) == frame+matmul ConvEncoder."""
    torch.manual_seed(0)
    N, L, S, T = 12, 16, 8, 160
    tconv = torch.nn.Conv1d(1, N, kernel_size=L, stride=S, bias=False)
    x = torch.randn(2, 1, T)
    expected = tconv(x).detach().numpy()  # (B, N, T')

    enc = ConvEncoder(N, L, S, in_channels=1)
    params = {"params": {"kernel": jnp.asarray(encoder_conv1d_weight(tconv.weight))}}
    ours = enc.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), expected, atol=1e-5)


def test_decoder_conv_transpose1d_parity():
    torch.manual_seed(1)
    N, L, S, Tp = 12, 16, 8, 30
    tconv = torch.nn.ConvTranspose1d(N, 1, kernel_size=L, stride=S, bias=False)
    w = torch.randn(2, N, Tp)
    expected = tconv(w).detach().numpy()  # (B, 1, T)

    dec = ConvDecoder(N, L, S, out_channels=1)
    params = {"params": {"kernel": jnp.asarray(conv_transpose1d_weight(tconv.weight))}}
    ours = dec.apply(params, jnp.asarray(w.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours)[..., 0], expected[:, 0], atol=1e-5)


def test_conv_transpose2d_parity():
    """torch ConvTranspose2d == flax nn.ConvTranspose with flipped kernel.

    Mirrors the D3Net/MMDenseNet decoder upsample (kernel == stride, no
    bias); torch's op is the gradient-of-conv so the converter must flip
    the spatial dims for flax's cross-correlating ConvTranspose.
    """
    from dnn_based_source_separation_tpu.hub.torch_convert import conv_transpose2d_weight

    torch.manual_seed(7)
    Cin, Cout, k, s = 6, 4, 2, 2
    tconv = torch.nn.ConvTranspose2d(Cin, Cout, kernel_size=k, stride=s, bias=False)
    x = torch.randn(2, Cin, 5, 7)
    expected = tconv(x).detach().numpy()  # (B, Cout, 10, 14)

    up = nn.ConvTranspose(Cout, (k, k), strides=(s, s), use_bias=False)
    params = {"params": {"kernel": jnp.asarray(conv_transpose2d_weight(tconv.weight))}}
    ours = up.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), expected, atol=1e-5
    )


def test_depthwise_conv_parity():
    torch.manual_seed(2)
    C, k, T = 8, 3, 50
    tconv = torch.nn.Conv1d(C, C, kernel_size=k, groups=C)
    x = torch.randn(2, C, T)
    expected = tconv(x).detach().numpy()

    conv = nn.Conv(features=C, kernel_size=(k,), feature_group_count=C, padding="VALID")
    params = {"params": {
        "kernel": jnp.asarray(depthwise_conv1d_weight(tconv.weight)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    ours = conv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), expected, atol=1e-5)


def test_dense_and_conv1x1_parity():
    torch.manual_seed(3)
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(5, 6)
    expected = lin(x).detach().numpy()
    dense = nn.Dense(4)
    params = {"params": {"kernel": jnp.asarray(dense_weight(lin.weight)),
                         "bias": jnp.asarray(lin.bias.detach().numpy())}}
    ours = dense.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_lstm_state_dict_conversion():
    torch.manual_seed(4)
    F, H, T = 5, 7, 11
    ref = torch.nn.LSTM(F, H, batch_first=True, bidirectional=True)
    x = torch.randn(3, T, F)
    expected, _ = ref(x)

    params = lstm_params(dict(ref.state_dict()), prefix="", num_layers=1, bidirectional=True)
    # prefix "" leaves a leading dot; rebuild with cleaned keys
    params = {k: v for k, v in params.items()}
    model = LSTM(hidden_size=H, bidirectional=True)
    ours = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), expected.detach().numpy(), atol=1e-5)


def test_full_conv_tasnet_conversion_structure():
    """Converted torch state_dict must drop into ConvTasNet.apply cleanly."""
    from dnn_based_source_separation_tpu.hub import convert_conv_tasnet
    from dnn_based_source_separation_tpu.models import ConvTasNet

    torch.manual_seed(5)
    config = dict(
        n_basis=16, kernel_size=8, stride=4, sep_hidden_channels=16,
        sep_bottleneck_channels=8, sep_skip_channels=8, sep_num_blocks=2,
        sep_num_layers=2, causal=False, n_sources=2,
    )
    model = ConvTasNet(enc_basis="trainable", dec_basis="trainable", enc_nonlinear="relu", **config)
    x = jnp.zeros((1, 1, 160))
    ref_params = model.init(jax.random.PRNGKey(0), x)

    # Build a synthetic torch state_dict with reference names and matching shapes.
    sd = {}
    sd["encoder.conv1d.weight"] = torch.randn(16, 1, 8)
    sd["decoder.conv_transpose1d.weight"] = torch.randn(16, 1, 8)
    sd["separator.norm1d.gamma"] = torch.randn(1, 16, 1)
    sd["separator.norm1d.beta"] = torch.randn(1, 16, 1)
    sd["separator.bottleneck_conv1d.weight"] = torch.randn(8, 16, 1)
    sd["separator.bottleneck_conv1d.bias"] = torch.randn(8)
    sd["separator.prelu.weight"] = torch.randn(1)
    sd["separator.mask_conv1d.weight"] = torch.randn(2 * 16, 8, 1)
    sd["separator.mask_conv1d.bias"] = torch.randn(2 * 16)
    for r in range(2):
        for l in range(2):
            ref = f"separator.tdcn.net.{r}.net.{l}"
            sd[f"{ref}.bottleneck_conv1d.weight"] = torch.randn(16, 8, 1)
            sd[f"{ref}.bottleneck_conv1d.bias"] = torch.randn(16)
            sd[f"{ref}.nonlinear1d.weight"] = torch.randn(1)
            sd[f"{ref}.norm1d.gamma"] = torch.randn(1, 16, 1)
            sd[f"{ref}.norm1d.beta"] = torch.randn(1, 16, 1)
            sc = f"{ref}.separable_conv1d"
            sd[f"{sc}.depthwise_conv1d.weight"] = torch.randn(16, 1, 3)
            sd[f"{sc}.depthwise_conv1d.bias"] = torch.randn(16)
            sd[f"{sc}.nonlinear1d.weight"] = torch.randn(1)
            sd[f"{sc}.norm1d.gamma"] = torch.randn(1, 16, 1)
            sd[f"{sc}.norm1d.beta"] = torch.randn(1, 16, 1)
            last = r == 1 and l == 1
            if not last:
                sd[f"{sc}.output_pointwise_conv1d.weight"] = torch.randn(8, 16, 1)
                sd[f"{sc}.output_pointwise_conv1d.bias"] = torch.randn(8)
            sd[f"{sc}.skip_pointwise_conv1d.weight"] = torch.randn(8, 16, 1)
            sd[f"{sc}.skip_pointwise_conv1d.bias"] = torch.randn(8)

    converted = convert_conv_tasnet(sd, config)

    # Tree structures must match exactly (same leaves, same shapes).
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_params)
    conv_flat = jax.tree_util.tree_leaves_with_path(jax.tree_util.tree_map(jnp.asarray, converted))
    ref_map = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
    conv_map = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in conv_flat}
    assert ref_map == conv_map

    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x)
    assert y.shape == (1, 2, 160)


def test_dprnn_conversion_structure():
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_dprnn_tasnet
    from dnn_based_source_separation_tpu.models import DPRNNTasNet

    torch.manual_seed(6)
    config = dict(sep_num_blocks=2, causal=False)
    model = DPRNNTasNet(
        n_basis=16, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=8, sep_hidden_channels=6,
        sep_chunk_size=10, sep_hop_size=5, sep_num_blocks=2,
        causal=False, n_sources=2,
    )
    x = jnp.zeros((1, 1, 160))
    ref_params = model.init(jax.random.PRNGKey(0), x)

    sd = {}
    sd["encoder.conv1d.weight"] = torch.randn(16, 1, 4)
    sd["decoder.conv_transpose1d.weight"] = torch.randn(16, 1, 4)
    sd["separator.norm1d.gamma"] = torch.randn(1, 16, 1)
    sd["separator.norm1d.beta"] = torch.randn(1, 16, 1)
    sd["separator.bottleneck_conv1d.weight"] = torch.randn(8, 16, 1)
    sd["separator.bottleneck_conv1d.bias"] = torch.randn(8)
    sd["separator.prelu.weight"] = torch.randn(1)
    sd["separator.mask_conv1d.weight"] = torch.randn(32, 8, 1)
    sd["separator.mask_conv1d.bias"] = torch.randn(32)
    H = 6
    for i in range(2):
        for blk, bi in (("intra_chunk_block", True), ("inter_chunk_block", True)):
            ref = f"separator.dprnn.net.{i}.{blk}"
            for sfx in (["_l0", "_l0_reverse"] if bi else ["_l0"]):
                sd[f"{ref}.rnn.weight_ih{sfx}"] = torch.randn(4 * H, 8)
                sd[f"{ref}.rnn.weight_hh{sfx}"] = torch.randn(4 * H, H)
                sd[f"{ref}.rnn.bias_ih{sfx}"] = torch.randn(4 * H)
                sd[f"{ref}.rnn.bias_hh{sfx}"] = torch.randn(4 * H)
            sd[f"{ref}.fc.weight"] = torch.randn(8, 2 * H)
            sd[f"{ref}.fc.bias"] = torch.randn(8)
            sd[f"{ref}.norm1d.gamma"] = torch.randn(1, 8, 1)
            sd[f"{ref}.norm1d.beta"] = torch.randn(1, 8, 1)

    converted = convert_dprnn_tasnet(sd, config)
    ref_flat = {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref_params)}
    conv_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                 for k, v in jax.tree_util.tree_leaves_with_path(
                     jax.tree_util.tree_map(jnp.asarray, converted))}
    assert ref_flat == conv_flat
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x)
    assert y.shape == (1, 2, 160)


def test_umx_conversion_structure():
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_open_unmix
    from dnn_based_source_separation_tpu.models import OpenUnmix

    torch.manual_seed(7)
    n_bins, max_bin, C, H, layers = 17, 10, 2, 8, 2
    config = dict(causal=False, num_layers=layers)
    model = OpenUnmix(in_channels=C, hidden_channels=H, num_layers=layers,
                      n_bins=n_bins, max_bin=max_bin)
    x = jnp.zeros((1, C, n_bins, 6))
    ref_vars = model.init(jax.random.PRNGKey(0), x)

    sd = {}
    for name, dim in (("scale_in", max_bin), ("bias_in", max_bin),
                      ("scale_out", n_bins), ("bias_out", n_bins)):
        sd[name] = torch.randn(dim)
    blocks = {"block": (C * max_bin, H), "net.0": (2 * H, H), "net.1": (H, C * n_bins)}
    for ref, (fin, fout) in blocks.items():
        sd[f"{ref}.fc.weight"] = torch.randn(fout, fin)
        sd[f"{ref}.norm1d.weight"] = torch.randn(fout)
        sd[f"{ref}.norm1d.bias"] = torch.randn(fout)
        sd[f"{ref}.norm1d.running_mean"] = torch.randn(fout)
        sd[f"{ref}.norm1d.running_var"] = torch.rand(fout) + 0.5
    half = H // 2
    for layer in range(layers):
        fin = H if layer == 0 else 2 * half
        for sfx in (f"_l{layer}", f"_l{layer}_reverse"):
            sd[f"rnn.weight_ih{sfx}"] = torch.randn(4 * half, fin)
            sd[f"rnn.weight_hh{sfx}"] = torch.randn(4 * half, half)
            sd[f"rnn.bias_ih{sfx}"] = torch.randn(4 * half)
            sd[f"rnn.bias_hh{sfx}"] = torch.randn(4 * half)

    converted = convert_open_unmix(sd, config)
    ref_flat = {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref_vars)}
    conv_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                 for k, v in jax.tree_util.tree_leaves_with_path(
                     jax.tree_util.tree_map(jnp.asarray, converted))}
    assert ref_flat == conv_flat
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x)
    assert y.shape == x.shape


def test_transformer_layer_conversion_parity():
    """Converted torch TransformerEncoderLayer must match numerically."""
    from dnn_based_source_separation_tpu.hub.torch_convert import _transformer_layer_params
    from dnn_based_source_separation_tpu.ops.attention import TransformerEncoderLayer

    torch.manual_seed(8)
    E, H, FF, T, B = 8, 2, 16, 6, 2
    ref = torch.nn.TransformerEncoderLayer(E, H, FF, dropout=0.0, batch_first=True)
    ref.eval()
    x = torch.randn(B, T, E)
    with torch.no_grad():
        expected = ref(x).numpy()

    sd = {f"layer.{k}": v for k, v in ref.state_dict().items()}
    params = _transformer_layer_params(sd, "layer")
    ours = TransformerEncoderLayer(E, H, d_ff=FF).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-5)


def _d3net_fixture():
    """Tiny D3Net config (reference checkpoint layout) + model + input."""
    from dnn_based_source_separation_tpu.models import D3Net

    torch.manual_seed(9)
    band = lambda v: {"low": v, "middle": v, "full": v}
    config = dict(
        bands=["low", "middle"],
        sections=[16, 16],
        in_channels=2,
        num_features=band(4),
        growth_rate={"low": [2, 3, 2], "middle": [2, 2, 2], "full": [2, 3, 2]},
        kernel_size=band(3),
        scale=band((2, 2)),
        num_d2blocks=band([2, 2, 2]),
        depth=band([2, 2, 2]),
        growth_rate_final=3, kernel_size_final=3, depth_final=2,
    )
    model = D3Net(
        in_channels=2, num_features=config["num_features"],
        growth_rate=config["growth_rate"], kernel_size=config["kernel_size"],
        bands=config["bands"], sections=config["sections"], scale=config["scale"],
        num_d2blocks=config["num_d2blocks"], depth=config["depth"],
        growth_rate_final=3, kernel_size_final=3, depth_final=2,
    )
    x = jnp.asarray(np.abs(np.random.default_rng(10).standard_normal((1, 2, 32, 16))), jnp.float32)
    return config, model, x


def test_d3net_conversion_structure():
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_d3net

    config, model, x = _d3net_fixture()
    ref_vars = model.init(jax.random.PRNGKey(0), x)

    sd = _d3net_state_dict(config)
    converted = convert_d3net(sd, config)
    ref_flat = {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref_vars)}
    conv_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                 for k, v in jax.tree_util.tree_leaves_with_path(
                     jax.tree_util.tree_map(jnp.asarray, converted))}
    missing = set(ref_flat) - set(conv_flat)
    extra = set(conv_flat) - set(ref_flat)
    assert not missing and not extra, f"missing={sorted(missing)[:4]} extra={sorted(extra)[:4]}"
    mism = {k for k in ref_flat if ref_flat[k] != conv_flat[k]}
    assert not mism, f"shape mismatch: {sorted(mism)[:4]}"
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x)
    assert y.shape == x.shape


def test_d3net_checkpoint_dispatch(tmp_path):
    """build_from_torch_checkpoint must route band-structured configs to D3Net."""
    from dnn_based_source_separation_tpu.hub import build_from_torch_checkpoint
    from dnn_based_source_separation_tpu.models import D3Net

    config, _, x = _d3net_fixture()
    sd = _d3net_state_dict(config)
    path = tmp_path / "d3net.pth"
    torch.save({**config, "state_dict": sd}, path)

    model, variables = build_from_torch_checkpoint(str(path))
    assert isinstance(model, D3Net)
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, variables), x)
    assert y.shape == x.shape


def _d3net_state_dict(config):
    # Synthesize a torch-style state_dict with matching shapes by walking
    # the flax tree backwards: easier to build from the reference names.
    sd = {}

    def bn(prefix, C):
        sd[f"{prefix}.weight"] = torch.randn(C)
        sd[f"{prefix}.bias"] = torch.randn(C)
        sd[f"{prefix}.running_mean"] = torch.randn(C)
        sd[f"{prefix}.running_var"] = torch.rand(C) + 0.5

    def conv(prefix, cin, cout, k=3):
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, k, k)
        sd[f"{prefix}.bias"] = torch.randn(cout)

    def d2(prefix, cin, gr_list):
        c = cin
        depth = len(gr_list)
        for i in range(depth):
            cout = sum(gr_list[i:])
            bn(f"{prefix}.net.{i}.norm2d", c)
            conv(f"{prefix}.net.{i}.conv2d", c, cout)
            c = gr_list[i]

    def d3(prefix, cin, gr, nd2, depth):
        # D3Block growth_rate is the per-stage growth (int) expanded to
        # [gr]*nd2; D2Block k emits sum(glist[k:]) channels.
        glist = [gr] * nd2
        c = cin
        for k in range(nd2):
            gout = sum(glist[k:])
            d2(f"{prefix}.net.{k}", c, [gout] * depth)
            c = glist[k]

    for name in ("scale_in", "bias_in", "scale_out", "bias_out"):
        sd[name] = torch.randn(32)

    for band_name in ("low", "middle", "full"):
        gr = config["growth_rate"][band_name]
        nd2 = config["num_d2blocks"][band_name]
        depth = config["depth"][band_name]
        nf = 4
        ref = f"net.{band_name}"
        conv(f"{ref}.conv2d", 2, nf)
        c = nf
        n_stages = len(gr)
        n_enc = n_stages // 2
        for i in range(n_enc):
            d3(f"{ref}.encoder.net.{i}.d3block", c, gr[i], nd2[i], depth[i])
            c = gr[i]
        d3(f"{ref}.bottleneck_conv2d", c, gr[n_enc], nd2[n_enc], depth[n_enc])
        c = gr[n_enc]
        for j, idx in enumerate(range(n_enc + 1, n_stages)):
            bn(f"{ref}.decoder.net.{j}.norm2d", c)
            sd[f"{ref}.decoder.net.{j}.upsample2d.weight"] = torch.randn(c, c, 2, 2)
            sd[f"{ref}.decoder.net.{j}.upsample2d.bias"] = torch.randn(c)
            d3(f"{ref}.decoder.net.{j}.d3block", c + gr[n_enc - 1 - j], gr[idx], nd2[idx], depth[idx])
            c = gr[idx]
        if band_name == "middle":  # gr[-1]=2 < out_channels=2? equal -> none
            pass

    # Final head: input channels = band out (2) concat full out (2) = 4.
    d2("d2block", 4, [3] * 2)
    bn("norm2d", 3)
    conv("glu2d.map", 3, 2, k=1)
    conv("glu2d.map_gate", 3, 2, k=1)
    return sd


def test_dptnet_conversion_structure():
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_dptnet
    from dnn_based_source_separation_tpu.models.dptnet import DPTNet

    torch.manual_seed(9)
    N, C, H, heads, blocks = 16, 8, 6, 2, 2
    config = dict(sep_num_blocks=blocks, causal=False)
    model = DPTNet(
        n_basis=N, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", sep_bottleneck_channels=C,
        sep_hidden_channels=H, sep_chunk_size=10, sep_hop_size=5,
        sep_num_blocks=blocks, sep_num_heads=heads, n_sources=2,
    )
    x = jnp.zeros((1, 1, 160))
    ref_params = model.init(jax.random.PRNGKey(0), x)

    sd = {}
    sd["encoder.conv1d.weight"] = torch.randn(N, 1, 4)
    sd["decoder.conv_transpose1d.weight"] = torch.randn(N, 1, 4)
    sd["separator.bottleneck_conv1d.weight"] = torch.randn(C, N, 1)
    sd["separator.bottleneck_conv1d.bias"] = torch.randn(C)
    sd["separator.norm2d.gamma"] = torch.randn(1, C, 1)
    sd["separator.norm2d.beta"] = torch.randn(1, C, 1)
    sd["separator.prelu.weight"] = torch.randn(1)
    sd["separator.map.weight"] = torch.randn(2 * N, C, 1)
    sd["separator.map.bias"] = torch.randn(2 * N)
    sd["separator.gtu.map.weight"] = torch.randn(N, N, 1)
    sd["separator.gtu.map.bias"] = torch.randn(N)
    sd["separator.gtu.map_gate.weight"] = torch.randn(N, N, 1)
    sd["separator.gtu.map_gate.bias"] = torch.randn(N)
    for i in range(blocks):
        for blk in ("intra_chunk_block", "inter_chunk_block"):
            ref = f"separator.dptransformer.net.{i}.{blk}.transformer"
            mha = f"{ref}.multihead_attn_block"
            sd[f"{mha}.multihead_attn.in_proj_weight"] = torch.randn(3 * C, C)
            sd[f"{mha}.multihead_attn.in_proj_bias"] = torch.randn(3 * C)
            sd[f"{mha}.multihead_attn.out_proj.weight"] = torch.randn(C, C)
            sd[f"{mha}.multihead_attn.out_proj.bias"] = torch.randn(C)
            sd[f"{mha}.norm1d.gamma"] = torch.randn(1, C, 1)
            sd[f"{mha}.norm1d.beta"] = torch.randn(1, C, 1)
            sub = f"{ref}.subnet"
            for sfx in ("_l0", "_l0_reverse"):
                sd[f"{sub}.rnn.weight_ih{sfx}"] = torch.randn(4 * H, C)
                sd[f"{sub}.rnn.weight_hh{sfx}"] = torch.randn(4 * H, H)
                sd[f"{sub}.rnn.bias_ih{sfx}"] = torch.randn(4 * H)
                sd[f"{sub}.rnn.bias_hh{sfx}"] = torch.randn(4 * H)
            sd[f"{sub}.fc.weight"] = torch.randn(C, 2 * H)
            sd[f"{sub}.fc.bias"] = torch.randn(C)
            sd[f"{sub}.norm1d.gamma"] = torch.randn(1, C, 1)
            sd[f"{sub}.norm1d.beta"] = torch.randn(1, C, 1)

    converted = convert_dptnet(sd, config)
    ref_flat = {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref_params)}
    conv_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                 for k, v in jax.tree_util.tree_leaves_with_path(
                     jax.tree_util.tree_map(jnp.asarray, converted))}
    assert ref_flat == conv_flat
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x)
    assert y.shape == (1, 2, 160)


def test_danet_conversion_structure():
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_danet
    from dnn_based_source_separation_tpu.models.danet import DANet

    torch.manual_seed(10)
    n_bins, D, H, blocks = 9, 4, 6, 2
    config = dict(num_blocks=blocks, causal=False)
    model = DANet(n_bins=n_bins, embed_dim=D, hidden_channels=H, num_blocks=blocks)
    x = jnp.abs(jnp.zeros((1, 1, n_bins, 12)))
    assignment = jnp.zeros((1, 2, n_bins, 12))
    ref_params = model.init(jax.random.PRNGKey(0), x, assignment)

    sd = {}
    for layer in range(blocks):
        F_in = n_bins if layer == 0 else 2 * H
        for sfx in (f"_l{layer}", f"_l{layer}_reverse"):
            sd[f"rnn.weight_ih{sfx}"] = torch.randn(4 * H, F_in)
            sd[f"rnn.weight_hh{sfx}"] = torch.randn(4 * H, H)
            sd[f"rnn.bias_ih{sfx}"] = torch.randn(4 * H)
            sd[f"rnn.bias_hh{sfx}"] = torch.randn(4 * H)
    sd["fc.weight"] = torch.randn(n_bins * D, 2 * H)
    sd["fc.bias"] = torch.randn(n_bins * D)

    converted = convert_danet(sd, config)
    ref_flat = {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref_params)}
    conv_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                 for k, v in jax.tree_util.tree_leaves_with_path(
                     jax.tree_util.tree_map(jnp.asarray, converted))}
    assert ref_flat == conv_flat
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x, assignment)
    assert y.shape == (1, 2, n_bins, 12)


def test_galrnet_conversion_structure():
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_galrnet
    from dnn_based_source_separation_tpu.models.galrnet import GALRNet

    torch.manual_seed(11)
    N, H, heads, blocks, K, Q = 8, 6, 2, 2, 10, 4
    config = dict(sep_num_blocks=blocks, causal=False, low_dimension=True)
    model = GALRNet(
        n_basis=N, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=H, sep_chunk_size=K, sep_hop_size=5,
        sep_down_chunk_size=Q, sep_num_blocks=blocks, sep_num_heads=heads,
        low_dimension=True, causal=False, n_sources=2,
    )
    x = jnp.zeros((1, 1, 160))
    ref_params = model.init(jax.random.PRNGKey(0), x)

    sd = {}
    sd["encoder.conv1d.weight"] = torch.randn(N, 1, 4)
    sd["decoder.conv_transpose1d.weight"] = torch.randn(N, 1, 4)
    sd["separator.norm2d.gamma"] = torch.randn(1, N, 1)
    sd["separator.norm2d.beta"] = torch.randn(1, N, 1)
    sd["separator.prelu.weight"] = torch.randn(1)
    sd["separator.map.weight"] = torch.randn(2 * N, N, 1)
    sd["separator.map.bias"] = torch.randn(2 * N)
    sd["separator.gtu.map.weight"] = torch.randn(N, N, 1)
    sd["separator.gtu.map.bias"] = torch.randn(N)
    sd["separator.gtu.map_gate.weight"] = torch.randn(N, N, 1)
    sd["separator.gtu.map_gate.bias"] = torch.randn(N)
    for i in range(blocks):
        intra = f"separator.galr.net.{i}.intra_chunk_block"
        for sfx in ("_l0", "_l0_reverse"):
            sd[f"{intra}.rnn.weight_ih{sfx}"] = torch.randn(4 * H, N)
            sd[f"{intra}.rnn.weight_hh{sfx}"] = torch.randn(4 * H, H)
            sd[f"{intra}.rnn.bias_ih{sfx}"] = torch.randn(4 * H)
            sd[f"{intra}.rnn.bias_hh{sfx}"] = torch.randn(4 * H)
        sd[f"{intra}.fc.weight"] = torch.randn(N, 2 * H)
        sd[f"{intra}.fc.bias"] = torch.randn(N)
        sd[f"{intra}.norm1d.gamma"] = torch.randn(1, N, 1)
        sd[f"{intra}.norm1d.beta"] = torch.randn(1, N, 1)
        inter = f"separator.galr.net.{i}.inter_chunk_block"
        sd[f"{inter}.fc_map.weight"] = torch.randn(Q, K)
        sd[f"{inter}.fc_map.bias"] = torch.randn(Q)
        sd[f"{inter}.norm2d_in.norm.weight"] = torch.randn(N)
        sd[f"{inter}.norm2d_in.norm.bias"] = torch.randn(N)
        sd[f"{inter}.multihead_attn.in_proj_weight"] = torch.randn(3 * N, N)
        sd[f"{inter}.multihead_attn.in_proj_bias"] = torch.randn(3 * N)
        sd[f"{inter}.multihead_attn.out_proj.weight"] = torch.randn(N, N)
        sd[f"{inter}.multihead_attn.out_proj.bias"] = torch.randn(N)
        sd[f"{inter}.norm2d_out.gamma"] = torch.randn(1, N, 1)
        sd[f"{inter}.norm2d_out.beta"] = torch.randn(1, N, 1)
        sd[f"{inter}.fc_inv.weight"] = torch.randn(K, Q)
        sd[f"{inter}.fc_inv.bias"] = torch.randn(K)

    converted = convert_galrnet(sd, config)
    ref_flat = {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref_params)}
    conv_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                 for k, v in jax.tree_util.tree_leaves_with_path(
                     jax.tree_util.tree_map(jnp.asarray, converted))}
    assert ref_flat == conv_flat
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x)
    assert y.shape == (1, 2, 160)


def test_adanet_conversion_structure():
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_adanet
    from dnn_based_source_separation_tpu.models.adanet import ADANet

    torch.manual_seed(12)
    n_bins, D, H, blocks, anchors = 9, 4, 6, 2, 5
    config = dict(num_blocks=blocks, num_anchors=anchors, causal=False)
    model = ADANet(n_bins=n_bins, embed_dim=D, hidden_channels=H,
                   num_blocks=blocks, num_anchors=anchors)
    x = jnp.abs(jnp.zeros((1, 1, n_bins, 12)))
    ref_params = model.init(jax.random.PRNGKey(0), x)

    sd = {"anchor": torch.randn(anchors, D)}
    for layer in range(blocks):
        F_in = n_bins if layer == 0 else 2 * H
        for sfx in (f"_l{layer}", f"_l{layer}_reverse"):
            sd[f"rnn.weight_ih{sfx}"] = torch.randn(4 * H, F_in)
            sd[f"rnn.weight_hh{sfx}"] = torch.randn(4 * H, H)
            sd[f"rnn.bias_ih{sfx}"] = torch.randn(4 * H)
            sd[f"rnn.bias_hh{sfx}"] = torch.randn(4 * H)
    sd["fc.weight"] = torch.randn(n_bins * D, 2 * H)
    sd["fc.bias"] = torch.randn(n_bins * D)

    converted = convert_adanet(sd, config)
    ref_flat = {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref_params)}
    conv_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                 for k, v in jax.tree_util.tree_leaves_with_path(
                     jax.tree_util.tree_map(jnp.asarray, converted))}
    assert ref_flat == conv_flat
    y = model.apply(jax.tree_util.tree_map(jnp.asarray, converted), x, n_sources=2)
    assert y.shape == (1, 2, n_bins, 12)
