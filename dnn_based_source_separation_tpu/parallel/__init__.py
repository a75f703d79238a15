"""Mesh construction and sharded train/eval steps.

This is the new-build replacement for the reference's `nn.DataParallel`
(its only parallelism; `egs/wsj0-mix/conv-tasnet/local/train.py:95`):
a single `jax.sharding.Mesh` with a 'data' axis (batch sharding; gradients
reduced by XLA psum over ICI) and an optional 'model' axis for intra-model
sharding demos (e.g. chunk-axis context parallelism in dual-path models).
"""

from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch
from .tensor import tp_dense_block
from .pipeline import pipeline_apply, pp_tdcn_forward, stack_stage_params
from .expert import ep_apply, ep_parallel_umx
from . import multihost
