"""L5: data layer -- audio IO, corpora datasets, batch pipelines."""

from .audio_io import read_wav, write_wav
from .loader import DataLoader
from .synthetic import SyntheticMixtureDataset
from .wsj0mix import (
    WaveTrainDataset,
    WaveEvalDataset,
    WaveTestDataset,
    SpectrogramTrainDataset,
    IdealMaskSpectrogramTrainDataset,
    WaveTrainVariableSourcesDataset,
)
from . import musdb18
