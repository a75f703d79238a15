"""L0/L1: pure-function DSP and NN primitives (TPU-first, static shapes)."""

from .windows import build_window, build_optimal_window
from .stft import stft, istft
from .segment import segment, overlap_add
from .norms import global_layer_norm, cumulative_layer_norm
from .pool import global_avg_pool, global_max_pool, median_pool1d, GeneralizedMeanPool
from .activation import concat_relu, complex_relu, zrelu, ModReLU
