"""Training stack: config, jitted epoch loop, checkpoints, logging, sweeps."""
from .config import TrainConfig, config_88, config_96, parse_cli
from .loop import build_head, make_optimizer, fit, TrainResult, evaluate
from .checkpoints import (save_checkpoint, restore_checkpoint, latest_step,
                          save_pytree, restore_pytree)
from .logging import (JsonlLogger, WandbLogger, MultiLogger, make_logger,
                      new_run_id, angle_distribution_summary,
                      learning_curve_summary, plot_learning_curves,
                      plot_angle_distributions)
from .sweep import SweepConfig, load_sweep_file, run_sweep, SweepResult

__all__ = [
    "TrainConfig", "config_88", "config_96", "parse_cli",
    "build_head", "make_optimizer", "fit", "TrainResult", "evaluate",
    "save_checkpoint", "restore_checkpoint", "latest_step",
    "save_pytree", "restore_pytree",
    "JsonlLogger", "WandbLogger", "MultiLogger", "make_logger",
    "new_run_id", "angle_distribution_summary",
    "learning_curve_summary", "plot_learning_curves",
    "plot_angle_distributions",
    "SweepConfig", "load_sweep_file", "run_sweep", "SweepResult",
]
