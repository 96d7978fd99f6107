"""Training: jit'd KD trainer, STE fake-quant, differentiable quantization.

Covers the reference's ``cnn_models/help_fun.py``,
``translation_models/help_fun.py``, ``quantization/help_functions.py``
(point optimization / bit assignment) and ``model_manager.py``.
"""

from . import losses, quantize_tree, tasks, trainer
from .loops import evaluate, fit
from .manager import ExperimentManager
from .losses import accuracy, cross_entropy, distillation_loss, kd_kl
from .tasks import lm_initial_carry, lm_task, nmt_task, vision_task
from .trainer import (
    Task,
    TrainState,
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
    preferred_grad_reduce_dtype,
)

__all__ = [
    "losses",
    "evaluate",
    "fit",
    "ExperimentManager",
    "quantize_tree",
    "tasks",
    "trainer",
    "accuracy",
    "cross_entropy",
    "distillation_loss",
    "kd_kl",
    "lm_initial_carry",
    "lm_task",
    "nmt_task",
    "vision_task",
    "Task",
    "TrainState",
    "build_optimizer",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "preferred_grad_reduce_dtype",
]
