"""Training: losses, generator/CVAE trainers, EMA, checkpoints."""

from . import checkpoint, losses, trainer, trainer_cvae
