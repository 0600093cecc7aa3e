"""Classification calibration metrics.

Vectorized JAX re-implementation of reference src/eval/calibration.py.
The reference builds Python lists of per-bin indices
(calibration.py:67-92); here binning is a ``segment_sum`` so the whole
metric evaluates on device in O(N).

Note on naming: the reference calls the per-point correctness indicator
``errors`` (calibration.py:22 computes bin *accuracy* from it); we call it
``correct`` to avoid the trap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def _static_bin_ids(confidences: jax.Array, bin_count: int) -> jax.Array:
    """bin = clamp(floor(conf * B), 0, B-1)  (reference calibration.py:70)."""
    ids = jnp.floor(confidences * bin_count).astype(jnp.int32)
    return jnp.clip(ids, 0, bin_count - 1)


def _adaptive_bin_ids(confidences: jax.Array, bin_count: int):
    """Equal-mass bins over sorted confidences with ``torch.chunk``
    semantics (reference calibration.py:74-76): chunk size = ceil(N/B),
    data ordered by confidence. Returns (bin id per *sorted* point,
    sorted order)."""
    n = confidences.shape[0]
    order = jnp.argsort(confidences)
    chunk = -(-n // bin_count)  # ceil div
    ids_sorted = jnp.arange(n, dtype=jnp.int32) // chunk
    return ids_sorted, order


def _bin_stats(bin_ids, correct, confidences, bin_count):
    counts = jax.ops.segment_sum(jnp.ones_like(confidences), bin_ids, bin_count)
    acc_sum = jax.ops.segment_sum(correct.astype(jnp.float32), bin_ids, bin_count)
    conf_sum = jax.ops.segment_sum(confidences.astype(jnp.float32), bin_ids, bin_count)
    safe = jnp.maximum(counts, 1.0)
    bin_acc = jnp.where(counts > 0, acc_sum / safe, 0.0)
    bin_conf = jnp.where(counts > 0, conf_sum / safe, 0.0)
    return counts, bin_acc, bin_conf


def _weighted_calibration_error(counts, bin_acc, bin_conf, signed=False):
    gap = bin_acc - bin_conf
    if not signed:
        gap = jnp.abs(gap)
    return jnp.sum(counts * gap) / jnp.sum(counts)


def calculate_ece(bin_count: int, correct, confidences) -> jax.Array:
    """Expected calibration error, static bins (reference calibration.py:9-11)."""
    correct, confidences = jnp.asarray(correct), jnp.asarray(confidences)
    ids = _static_bin_ids(confidences, bin_count)
    return _weighted_calibration_error(*_bin_stats(ids, correct, confidences, bin_count))


def calculate_mce(bin_count: int, correct, confidences) -> jax.Array:
    """Maximum calibration error (reference calibration.py:13-15, 89-92).
    Empty bins contribute |0 - 0| = 0, matching the reference."""
    correct, confidences = jnp.asarray(correct), jnp.asarray(confidences)
    ids = _static_bin_ids(confidences, bin_count)
    _, bin_acc, bin_conf = _bin_stats(ids, correct, confidences, bin_count)
    return jnp.max(jnp.abs(bin_acc - bin_conf))


def calculate_ace(bin_count: int, correct, confidences) -> jax.Array:
    """Adaptive calibration error (reference calibration.py:5-7)."""
    correct, confidences = jnp.asarray(correct), jnp.asarray(confidences)
    ids_sorted, order = _adaptive_bin_ids(confidences, bin_count)
    stats = _bin_stats(ids_sorted, correct[order], confidences[order], bin_count)
    return _weighted_calibration_error(*stats)


class CalibrationResults(struct.PyTreeNode):
    """Per-bin statistics + ECE / signed ECE
    (reference ClassificationCalibrationResults, calibration.py:94-126)."""

    bin_counts: jax.Array
    bin_accuracys: jax.Array
    bin_confidences: jax.Array
    ece: jax.Array

    @classmethod
    def create(cls, bin_count: int, correct, confidences) -> "CalibrationResults":
        correct, confidences = jnp.asarray(correct), jnp.asarray(confidences)
        ids = _static_bin_ids(confidences, bin_count)
        counts, bin_acc, bin_conf = _bin_stats(ids, correct, confidences, bin_count)
        ece = _weighted_calibration_error(counts, bin_acc, bin_conf)
        return cls(
            bin_counts=counts, bin_accuracys=bin_acc, bin_confidences=bin_conf, ece=ece
        )

    @property
    def signed_ece(self) -> jax.Array:
        """Signed ECE: positive = underconfident (reference
        calibration.py:119-126)."""
        return _weighted_calibration_error(
            self.bin_counts, self.bin_accuracys, self.bin_confidences, signed=True
        )

    @classmethod
    def average(cls, results: list["CalibrationResults"]) -> "CalibrationResults":
        """Field-wise mean across repetitions (reference calibration.py:95-106)."""
        return jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *results)
