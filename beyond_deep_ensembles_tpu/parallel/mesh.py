"""Device-mesh utilities.

The reference has no PyTorch-side distribution at all (SURVEY.md §2.7) and
its JAX subtree used ``pmap`` + ``lax.psum`` over a flat device axis
(reference google-bnn-hmc/bnn_hmc/utils/train_utils.py:119-164). The
TPU-native design is single-controller jit over a 2-D
``jax.sharding.Mesh``:

  * ``data`` axis: batch sharding (data parallelism; gradients are
    combined by XLA-inserted all-reduces over ICI);
  * ``member`` axis: ensemble members / SVGD particles / MC samples — the
    prime parallel resource of BDL workloads (the reference looped over
    them on the host, SURVEY.md §2.7 "ensemble/particle parallelism").

Everything works on any device count: axes of size 1 are legal, and
states/batches whose leading axes do not divide the mesh fall back to
replication.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MEMBER_AXIS = "member"


def make_mesh(
    n_devices: Optional[int] = None,
    member_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a (member, data) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % member_parallel != 0:
        raise ValueError(
            f"make_mesh: {n} visible device(s) not divisible by "
            f"member_parallel={member_parallel}. Either pass a divisor of "
            f"{n}, or provision more devices (for a virtual CPU mesh set "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=<n> "
            f"before the first jax import)."
        )
    grid = np.asarray(devices).reshape(member_parallel, n // member_parallel)
    return Mesh(grid, (MEMBER_AXIS, DATA_AXIS))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Shard leading (batch) axis over the data axis; replicate across
    members."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), batch)


def shard_member_state(mesh: Mesh, state, n_members: int):
    """Shard any leaf whose leading axis equals ``n_members`` over the
    member axis; replicate the rest (step counters, scalars, ...)."""
    member_shard = NamedSharding(mesh, P(MEMBER_AXIS))
    repl = NamedSharding(mesh, P())
    member_size = mesh.shape[MEMBER_AXIS]

    def place(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] == n_members
            and n_members % member_size == 0
        ):
            return jax.device_put(leaf, member_shard)
        return jax.device_put(leaf, repl)

    return jax.tree.map(place, state)
