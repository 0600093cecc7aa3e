"""Evaluation metrics: calibration (ECE/signed-ECE/ACE/MCE), regression
(LML/QCE/sQCE) and shared classification analysis — vectorized JAX
re-implementations of reference src/eval/ and
experiments/base/multiclass_classification.py."""
from .calibration import (  # noqa: F401
    CalibrationResults,
    calculate_ace,
    calculate_ece,
    calculate_mce,
)
from .regression import RegressionResults  # noqa: F401
from .classification import analyze_output, bayesian_model_average  # noqa: F401
