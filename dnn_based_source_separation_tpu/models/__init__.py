"""L3: the model zoo."""

from .base import register_model, save_model, load_model, get_model_class
from .conv_tasnet import ConvTasNet
