"""Checkpoint-driven downstream phases: MultiX ensembling and post-hoc
Laplace fitting.

Reference: per-task ``eval_ensembles.py`` builds a DeepEnsemble from
4-of-5 saved single-model checkpoints (leave-one-out,
civilcomments/eval_ensembles.py:34-48) and ``fit_laplace.py`` fits
laplace-torch on saved MAP checkpoints (SURVEY.md §2.5). Here both phases
operate on orbax checkpoints of MethodStates.
"""
from __future__ import annotations

from typing import List, Sequence

from ..methods import deep_ensemble, laplace_method
from ..methods.api import PosteriorMethod
from ..tree import tree_stack
from ..utils import checkpoint as ckpt


def load_members(
    run_dirs: Sequence[str], name: str, state_template
) -> List:
    """Load the ``{name}_final`` state from each run directory
    (reference results/<Run>/log/rep_0i{model}_final.tar layout)."""
    return [ckpt.restore_final(d, name, state_template) for d in run_dirs]


def multix_from_checkpoints(
    inner_method: PosteriorMethod,
    states: Sequence,
    leave_out: int = None,
):
    """Stack independently-trained single-model states into one MultiX
    ensemble state (reference eval_ensembles leave-one-out: 4-of-5
    members, civilcomments/eval_ensembles.py:34-48)."""
    states = list(states)
    if leave_out is not None:
        states = [s for i, s in enumerate(states) if i != leave_out]
    method = deep_ensemble(inner_method, n_members=len(states))
    stacked = tree_stack(states)
    return method, stacked


def fit_laplace_from_checkpoint(
    model,
    map_state,
    train_data,
    hessian: str = "full",
    regression: bool = False,
):
    """Post-hoc Laplace on a saved MAP state (reference fit_laplace.py)."""
    method = laplace_method(model, hessian=hessian, regression=regression)
    return method, method.fit(map_state, train_data)
