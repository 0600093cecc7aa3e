"""Checkpoint / resume.

Reference behavior to match (SURVEY.md §5): periodic state saves during
training (cifar.py:175-176), a ``{model}_final`` at the end (cifar.py:98)
consumed by the downstream eval_ensembles / fit_laplace phases, and the
JAX subtree's preemption-safe auto-resume that scans the run directory
for the latest ``checkpoint_<step>`` (bnn_hmc/utils/checkpoint_utils.py:80-96).

Implementation: orbax PyTreeCheckpointer over the full MethodState pytree
(params + optimizer/posterior state — SWAG moments, SVGD particles, iVON
precision all ride along for free since they are state fields).
"""
from __future__ import annotations

import os
import re
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"checkpoint_(\d+)$")


def _checkpointer():
    return ocp.PyTreeCheckpointer()


class _AsyncSaver:
    """Overlap checkpoint saves with subsequent training epochs.

    A synchronous orbax save blocks the epoch loop on the full
    device->host transfer of the state — measured at ~110 s/epoch for
    the DistilBERT+Adam state (~800 MB) on the tunneled TPU backend,
    x29 the pure train-scan epoch (benchmarks/sustained_big.py, r5).
    The TPU-native fix: initiate a NON-BLOCKING device->host copy of
    every leaf (``copy_to_host_async`` — jax caches the host copy), then
    run the orbax write in a daemon thread while the next epoch's
    device scan computes. Training state pytrees are functional
    (never mutated in place), so the snapshot is race-free; at most one
    save is in flight (a new save joins the previous one first), and
    ``wait_for_async_saves()`` is the end-of-training barrier before
    save_final/restore read the directory."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    def save(self, path: str, state: Any):
        self.wait()
        # NOTE: do NOT copy_to_host_async-prefetch the leaves here. On the
        # tunneled axon backend the async-transfer path is ~50x slower
        # than a blocking bulk device_get (measured: ~300 s vs 6.4 s for
        # the ~800 MB DistilBERT+Adam state), and every subsequent tunnel
        # operation queues behind it — the per-epoch eval fetch went from
        # 0.2 s to 220-330 s and grew each epoch while prefetched saves
        # drained (benchmarks/sustained_big.py instrumented run, r5). The
        # daemon thread's own blocking device_get inside orbax is fast
        # and still overlaps the next epoch's compute.

        def _write():
            try:
                _checkpointer().save(path, state, force=True)
            except BaseException as e:  # surfaced on the next wait()
                self._err = e

        self._thread = threading.Thread(
            target=_write, name="bde-ckpt-save", daemon=True
        )
        self._thread.start()

    def wait(self):
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        err, self._err = self._err, None
        if err is not None:
            raise err


_ASYNC_SAVER = _AsyncSaver()


def wait_for_async_saves():
    """Barrier: block until any in-flight async checkpoint write has
    committed (and re-raise its error, if any)."""
    _ASYNC_SAVER.wait()


def save_checkpoint(run_dir: str, step: int, state: Any, async_save: bool = False):
    """Write ``<run_dir>/checkpoint_<step>``. With ``async_save`` the
    write overlaps subsequent compute (see _AsyncSaver); callers must
    ``wait_for_async_saves()`` before reading the run directory."""
    path = os.path.join(os.path.abspath(run_dir), f"checkpoint_{step}")
    if async_save:
        _ASYNC_SAVER.save(path, state)
        return path
    _checkpointer().save(path, state, force=True)
    return path


def save_final(run_dir: str, name: str, state: Any):
    """The ``{model}_final`` artifact downstream phases read
    (reference cifar.py:98)."""
    _ASYNC_SAVER.wait()
    path = os.path.join(os.path.abspath(run_dir), f"{name}_final")
    _checkpointer().save(path, state, force=True)
    return path


def latest_checkpoint_step(run_dir: str) -> Optional[int]:
    _ASYNC_SAVER.wait()
    if not os.path.isdir(run_dir):
        return None
    steps = []
    for entry in os.listdir(run_dir):
        m = _CKPT_RE.match(entry)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(run_dir: str, state_template: Any, step: Optional[int] = None):
    """Restore the given (or latest) checkpoint into the template's
    structure; returns (state, step) or (template, None) when nothing to
    resume from — the auto-resume contract of the reference's
    maybe_restore (checkpoint_utils.py:80-96)."""
    if step is None:
        step = latest_checkpoint_step(run_dir)
        if step is None:
            return state_template, None
    path = os.path.join(os.path.abspath(run_dir), f"checkpoint_{step}")
    restored = _checkpointer().restore(path, item=state_template)
    return restored, step


def restore_final(run_dir: str, name: str, state_template: Any):
    path = os.path.join(os.path.abspath(run_dir), f"{name}_final")
    return _checkpointer().restore(path, item=state_template)
