"""L2: loss/criterion library.

Capability parity with reference `src/criterion/` (sdr.py, pit.py,
combination.py, deep_clustering.py, distance.py, divergence.py, entropy.py).
All criteria are pure-JAX callables exposing the same protocol the reference
drivers rely on: `criterion(input, target, batch_mean=True)` plus a
`maximize` attribute consumed by PIT.
"""

from .sdr import (
    EPS,
    sdr,
    sisdr,
    thresholded_snr,
    weighted_sdr,
    SDR,
    NegSDR,
    SISDR,
    NegSISDR,
    NegThresholdedSNR,
    ClippedSISDR,
    WeightedSDR,
    NegWeightedSDR,
)
from .pit import pit, prob_pit, sinkpit, orpit, PIT, PIT1d, PIT2d, ORPIT, ProbPIT, SinkPIT
from .combination import CombinationLoss
from .deep_clustering import AffinityLoss
from .distance import L1Loss, L2Loss, MSELoss, MAELoss, CosineSimilarityLoss
from .divergence import kl_divergence, is_divergence, generalized_kl_divergence, beta_divergence
from .entropy import BinaryCrossEntropy, CategoricalCrossEntropy, DiceLoss
from .metric_learn import (
    AdditiveAngularMarginLoss,
    ContrastiveLoss,
    ContrastiveWithDistanceLoss,
    TripletLoss,
    TripletWithDistanceLoss,
    arcface_logits,
)
from .hungarian import HungarianLoss, hungarian_pit
from .mixit import MixIT, mixit, mixture_assignment_table
