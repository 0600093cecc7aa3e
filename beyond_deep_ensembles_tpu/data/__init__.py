"""Dataset layer: UCI regression, CIFAR-10(+C), MNIST family, WILDS.

All loaders yield numpy/jax arrays in NHWC with STATIC batch shapes (the
last partial batch is dropped or padded) so the jitted train/eval steps
compile once. Real datasets load from ``BDE_DATA_DIR`` (or ``./data``)
when present; synthetic generators with matching shapes/statistics back
every loader so tests and benchmarks run hermetically.
"""
from .uci import UCIDataset, batch_iter  # noqa: F401
