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
from typing import Any, Optional

import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"checkpoint_(\d+)$")


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(run_dir: str, step: int, state: Any):
    """Write ``<run_dir>/checkpoint_<step>``."""
    path = os.path.join(os.path.abspath(run_dir), f"checkpoint_{step}")
    _checkpointer().save(path, state, force=True)
    return path


def save_final(run_dir: str, name: str, state: Any):
    """The ``{model}_final`` artifact downstream phases read
    (reference cifar.py:98)."""
    path = os.path.join(os.path.abspath(run_dir), f"{name}_final")
    _checkpointer().save(path, state, force=True)
    return path


def latest_checkpoint_step(run_dir: str) -> Optional[int]:
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
