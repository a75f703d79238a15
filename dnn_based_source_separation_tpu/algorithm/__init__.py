"""L1: classical algorithms (masks, Wiener EM, phase reconstruction,
clustering, NMF)."""

from .frequency_mask import (
    compute_ideal_binary_mask,
    compute_ideal_ratio_mask,
    compute_wiener_filter_mask,
    compute_ideal_amplitude_mask,
    compute_phase_sensitive_mask,
    compute_ideal_complex_mask,
    multichannel_wiener_filter,
)
from .griffin_lim import griffin_lim, fast_griffin_lim, GriffinLim, FastGriffinLim
from .misi import misi, MISI
from .clustering import KMeans, SoftKMeans, SphericalKMeans, GMMClustering
from .nmf import NMF
