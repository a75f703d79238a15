"""L6: training/eval drivers (epoch loop, LR halving, checkpoint/resume)."""

from .steps import make_train_step, make_eval_step, make_optimizer, get_learning_rate, set_learning_rate
from .trainer import Trainer, TrainerConfig
