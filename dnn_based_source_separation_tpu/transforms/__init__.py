"""Transforms: STFT re-exports, cepstrum, PCA.

Capability parity: reference `src/transforms/` (stft.py, cepstrum.py,
pca.py).
"""

from ..ops.stft import stft, istft
from .cepstrum import real_cepstrum, complex_cepstrum, minimum_phase
from .pca import pca
