"""L4: factory glue and utilities."""

from .bss import bss_eval_sources
from .utils import set_seed, draw_loss_curve, enable_persistent_compilation_cache
from .audio import mu_law_compand, inv_mu_law_compand
