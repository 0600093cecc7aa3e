"""Scaling knobs for flat posterior ring buffers.

HMC/SGMCMC keep a ``[max_samples, D]`` ring of flat posterior draws
(methods/hmc.py, methods/sgmcmc.py) and SWAG a ``[K, D]`` deviation ring
plus ``[D]`` moment vectors (methods/swag.py). At ResNet-20 scale these
are trivial; at the reference's big backbones (ResNet-50 ~25.6M params,
reference experiments/iwildcam/models.py:171) a 20-slot fp32 ring is
~2 GB — too large to replicate per device next to training state.

Two orthogonal knobs, threaded through each method's factory:

* ``ring_dtype`` (default fp32): store the ring in bf16 to halve HBM.
  Rings hold posterior DRAWS (HMC/SGMCMC) or deviations around a running
  mean (SWAG); bf16's ~3 decimal digits cost noise well below the
  posterior's own MC variance. Compute stays fp32: draws are upcast on
  read, and SWAG's ``z1 @ deviations`` contraction runs with
  ``preferred_element_type=float32``.

* ``ring_sharding`` (default None = replicated): a
  ``jax.sharding.NamedSharding`` whose LAST spec axis shards the flat
  parameter dimension D over a mesh axis, e.g.
  ``NamedSharding(mesh, P(None, "data"))``. Each of N devices then holds
  ``[K, D/N]``; XLA keeps every ring op (roll/set/where) local and only
  gathers when a draw is unraveled back into params. This is the
  TPU-native answer to the reference's CPU-side SWAG buffers
  (swag.py:91-105): distributed HBM instead of host round trips.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _axis_size(sharding: Optional[NamedSharding]) -> int:
    if sharding is None:
        return 1
    axes = [a for a in sharding.spec if a is not None]
    if not axes:
        return 1
    size = 1
    for a in axes[-1] if isinstance(axes[-1], tuple) else (axes[-1],):
        size *= sharding.mesh.shape[a]
    return size


def padded_width(d: int, sharding: Optional[NamedSharding]) -> int:
    """GSPMD requires the sharded dimension to divide evenly over the
    axis; rings pad flat-D up to the next multiple (zeros; sliced off on
    read)."""
    n = _axis_size(sharding)
    return ((d + n - 1) // n) * n


def pad_flat(flat: jax.Array, sharding: Optional[NamedSharding]) -> jax.Array:
    pad = padded_width(flat.shape[0], sharding) - flat.shape[0]
    return jnp.pad(flat, (0, pad)) if pad else flat


def ring_spec(sharding: Optional[NamedSharding], ndim: int):
    """The sharding for an ndim-rank ring leaf: last axis inherits the
    LAST axis of the given spec (the flat-D axis), others replicate."""
    if sharding is None:
        return None
    axes = [a for a in sharding.spec if a is not None]
    last = axes[-1] if axes else None
    return NamedSharding(sharding.mesh, P(*([None] * (ndim - 1) + [last])))


def place(arr: jax.Array, sharding: Optional[NamedSharding]):
    """Constrain a ring buffer onto the mesh. Works both eagerly (init:
    acts as a device_put) and under jit (update: a GSPMD constraint)."""
    spec = ring_spec(sharding, arr.ndim)
    if spec is None:
        return arr
    return jax.lax.with_sharding_constraint(arr, spec)


def store(arr: jax.Array, dtype) -> jax.Array:
    """Downcast for ring storage (no-op at fp32)."""
    return arr.astype(dtype)


def load(arr: jax.Array) -> jax.Array:
    """Upcast a ring row back to fp32 compute precision."""
    return arr.astype(jnp.float32)
