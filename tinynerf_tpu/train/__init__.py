from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .config import TrainConfig
from .loop import (
    MarchPolicy,
    build_renderer,
    evaluate,
    infer,
    init_opt_state,
    make_optimizer,
    make_train_step,
    train,
)
from .metrics import EvalMetrics, TrainMetrics, eval_metrics, psnr, ssim

__all__ = [
    "TrainConfig",
    "train",
    "infer",
    "evaluate",
    "build_renderer",
    "init_opt_state",
    "make_optimizer",
    "make_train_step",
    "MarchPolicy",
    "EvalMetrics",
    "TrainMetrics",
    "eval_metrics",
    "psnr",
    "ssim",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
]
