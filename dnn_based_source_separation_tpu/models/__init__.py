"""L3: the model zoo."""

from .base import register_model, save_model, load_model, get_model_class
from .conv_tasnet import ConvTasNet
from .dprnn_tasnet import DPRNNTasNet
from .lstm_tasnet import LSTMTasNet, TasNet, TasNetBase
from .sepformer import SepFormer
from .dptnet import DPTNet
from .dptransformer import DualPathTransformer
from .galrnet import GALRNet
from .umx import OpenUnmix, ParallelOpenUnmix
from .xumx import CrossNetOpenUnmix
from .danet import DANet, FixedAttractorDANet
from .adanet import ADANet
from .deep_clustering import DeepEmbedding, ChimeraNet, DeepEmbeddingPlus
from .densenet import DenseNet
from .m_densenet import MDenseNet
from .mm_densenet import MMDenseNet, ParallelMMDenseNet, TimeDomainWrapper
from .mm_dense_rnn import MMDenseRNN, MMDenseLSTM, ParallelMMDenseLSTM
from .d3net import D3Net, ParallelD3Net
from .wavenet import WaveNet
from .mrx import MultiResolutionCrossNet
from .unet import UNet1d, UNet2d, EnsembleUNet1d, EnsembleUNet2d
from .galr import GALR
from .cunet import ConditionedUNet2d, ControlDenseNet, ControlConvNet
from .cunet_choi import TDCUNet2d
from .hrnet import HRNet
from .wavesplit import WaveSplit, speaker_distance_loss
from .meta_tasnet import MetaTasNet
from .furcanet import FurcaNet
from .lasaft import LaSAFT, TFCLaSAFT, TDF2d, TFC2d
from .vision import MLPMixer, PoolFormer, ViT
from .film import film, pocm, gpocm
from .wrappers import SpectrogramMaskingWrapper
