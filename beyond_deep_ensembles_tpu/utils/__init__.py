"""Runtime utilities: config/sweep expansion, checkpointing, logging,
LR schedules."""
from .config import load_sweep, expand_config  # noqa: F401
from .schedules import wilson_schedule, step_schedule  # noqa: F401
