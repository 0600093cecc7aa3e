"""Per-task variational scope of the full-model bbb/rank1 builds.

The reference builds full-model "bbb"/"rank1" differently per task:
- pretrained-backbone tasks (iwildcam/rxrx1/fmow) put a single
  BBBLinear / Rank1Linear HEAD on a plain net (iwildcam/models.py:
  101-105 + 110-114, rxrx1/models.py:82-92, fmow/models.py:92-102),
  with ``all_layers_bbb: True`` (iwildcam only) switching to
  make_module_bbb over everything (iwildcam.yaml BBB_full);
- the from-scratch camelyon/poverty nets are fully variational
  (camelyon/models.py:97-116, poverty/models.py:77-83).

Getting this wrong inflates the KL by the backbone/head parameter
ratio (~6x on the tiny iwildcam resnet) — caught by the iWildCam e2e
track's train-loss trace; this fast-lane test pins the scope directly
on the built parameter trees.
"""
from __future__ import annotations

import jax
import pytest

from beyond_deep_ensembles_tpu.experiments import wilds_task
from beyond_deep_ensembles_tpu.nn.gaussian import GRHO_SUFFIX


def _grho_leaves(params):
    names = []
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = str(getattr(path[-1], "key", path[-1]))
        if name.endswith(GRHO_SUFFIX):
            names.append(tuple(str(getattr(p, "key", p)) for p in path))
    return names


def _build(task, model, **over):
    config = {
        **wilds_task.DEFAULT_CONFIG,
        "model": model,
        "epochs": 1,
        "tiny": True,
        "pretrained": False,
        "dataset_size": 64,
        "dropout_p": None,
        "init_std": 0.1,
        "learn_var": True,
        **over,
    }
    return wilds_task.build(task, config, jax.random.key(0), steps_per_epoch=2)


@pytest.mark.parametrize("task", ["iwildcam", "fmow"])
def test_bbb_head_only_on_pretrained_backbone_tasks(task):
    built = _build(task, "bbb")
    rhos = _grho_leaves(built.state.params)
    # exactly one Gaussian layer: the head's kernel + bias
    assert len(rhos) == 2, rhos


def test_all_layers_bbb_makes_backbone_variational():
    head_only = _build("iwildcam", "bbb")
    full = _build("iwildcam", "bbb", all_layers_bbb=True)
    assert len(_grho_leaves(full.state.params)) > len(
        _grho_leaves(head_only.state.params)
    )


@pytest.mark.parametrize("task", ["camelyon17", "poverty"])
def test_bbb_fully_variational_on_from_scratch_tasks(task):
    built = _build(task, "bbb")
    # convs variational too, not just the head
    assert len(_grho_leaves(built.state.params)) > 2


def test_rank1_head_only_on_pretrained_backbone_tasks():
    built = _build("fmow", "rank1")
    rhos = _grho_leaves(built.state.params)
    # Rank1Linear: r/s Gaussian factors of the head only (kernel-side
    # u/v vectors, no bias factor — nn/rank1.py)
    assert 1 <= len(rhos) <= 2, rhos
