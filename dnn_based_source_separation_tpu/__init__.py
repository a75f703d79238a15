"""TPU-native DNN source-separation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
tky823/DNN-based_source_separation (reference mounted at /root/reference),
designed TPU-first: static shapes, channels-last layouts feeding the MXU,
`vmap` over source permutations, `lax.scan` recurrences, and a single
`jax.sharding.Mesh` abstraction for data/model parallelism.

Layout (mirrors the reference's 7-layer onion, SURVEY.md §1):
  ops/        L0/L1 -- pure-function DSP + NN primitives (stft, filterbanks,
              segment/overlap-add, norms, masks) and Pallas kernels
  criterion/  L2   -- losses (SDR family, PIT/ORPIT/SinkPIT, combination, ...)
  models/     L3   -- the model zoo (Conv-TasNet, DPRNN-TasNet, UMX, ...)
  algorithm/  L1   -- classical algorithms (clustering, Wiener EM, Griffin-Lim,
              MISI, NMF)
  utils/      L4   -- factory glue, audio utils, seeding
  data/       L5   -- corpora-style datasets and batch pipelines
  train/      L6   -- Trainer/Tester drivers (epoch loop, LR halving,
              checkpoint/resume)
  parallel/   (new) -- mesh construction + sharded train/eval steps
"""

__version__ = "0.1.0"
