"""Multi-chip training pipelines: wire a PosteriorMethod onto a mesh.

The reference's only distribution was pmap data-parallelism in the JAX
subtree (SURVEY.md §2.7). Here any method trains data-parallel (batch
sharded over the ``data`` axis; XLA all-reduces gradients over ICI) and
member/particle-parallel (stacked state sharded over the ``member``
axis) with one helper.
"""
from __future__ import annotations

from typing import Optional

import jax

from ..methods.api import PosteriorMethod
from .mesh import make_mesh, replicate, shard_batch, shard_member_state


class ParallelTrainer:
    """Places state/batches on the mesh and jits the update once.

    n_members: size of the leading member/particle axis of the state
    (1 = pure data parallelism; the state is replicated).
    """

    def __init__(
        self,
        method: PosteriorMethod,
        mesh=None,
        n_members: int = 1,
        member_parallel: Optional[int] = None,
    ):
        self.method = method
        if mesh is None:
            mesh = make_mesh(member_parallel=member_parallel or 1)
        self.mesh = mesh
        self.n_members = n_members
        # donation is opt-in (see parallel/multistep.py: the axon backend
        # miscompiles donated iVON states inside scans)
        self._update = jax.jit(method.update)

    def place_state(self, state):
        if self.n_members > 1:
            return shard_member_state(self.mesh, state, self.n_members)
        return replicate(self.mesh, state)

    def place_batch(self, batch):
        return shard_batch(self.mesh, batch)

    def step(self, state, key, batch):
        with jax.set_mesh(self.mesh):
            return self._update(state, key, self.place_batch(batch))

    def finalize_epoch(self, state):
        with jax.set_mesh(self.mesh):
            return self.method.finalize_epoch(state)
