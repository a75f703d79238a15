"""Hub: pretrained-checkpoint conversion and fetching.

Replaces the reference's Google-Drive/gdown hub
(`src/models/conv_tasnet.py:238-310`, `src/utils/utils.py:36-47`) with a
pluggable fetcher plus a torch-state-dict -> flax-params converter, so
PyTorch checkpoints from PRETRAINED.md can run on TPU.
"""

from .torch_convert import (
    conv1d_weight,
    conv_transpose1d_weight,
    dense_weight,
    depthwise_conv1d_weight,
    lstm_params,
    convert_adanet,
    convert_conv_tasnet,
    convert_danet,
    convert_dprnn_tasnet,
    convert_dptnet,
    convert_d3net,
    convert_galrnet,
    convert_lstm_tasnet,
    convert_mm_dense_rnn,
    convert_mm_densenet,
    convert_mrx,
    convert_open_unmix,
    convert_sepformer,
    convert_xumx,
    build_from_torch_checkpoint,
)
