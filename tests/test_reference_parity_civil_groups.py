"""Differential parity of the CivilComments per-group fairness eval
against the LIVE reference code (experiments/civilcomments/civil.py:22-89
get_group / eval_group — the reference's own implementation, not the
wilds package): per-identity-group x toxic/non-toxic accuracies and the
worst-group accuracy on synthetic predictions."""
from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def _import_ref_civil():
    from _ref_stubs import install_common_stubs, install_wilds1_stub

    install_common_stubs()
    # civil.py imports the wilds1 loader module and the model builders at
    # module scope; the group-eval functions under test need neither.
    install_wilds1_stub()
    import experiments.civilcomments.civil as ref_civil

    return ref_civil


def test_civil_group_accuracies_match_reference():
    ref_civil = _import_ref_civil()
    from experiments.base.multiclass_classification import _analyze_output

    from beyond_deep_ensembles_tpu.data.wilds import (
        CIVIL_GROUPS,
        worst_group_accuracy,
    )

    rng = np.random.RandomState(5)
    n = 600
    targets = rng.randint(0, 2, size=n)
    meta = rng.binomial(1, 0.25, size=(n, 8)).astype(np.int64)
    logits = rng.randn(n, 2).astype(np.float32) * 2
    outputs = torch.log_softmax(torch.from_numpy(logits), dim=1)
    t_targets = torch.from_numpy(targets)
    t_meta = torch.from_numpy(meta)

    errors, confidences, lls, _, _ = _analyze_output(outputs, t_targets, None)
    config = {"ece_bins": 10}

    ref_cells = {}
    ref_names = [
        "male", "female", "lgbtq", "christian", "muslim",
        "other_religion", "black", "white",
    ]
    for gi, gname in enumerate(ref_names):
        for toxic in (False, True):
            group = ref_civil.get_group(t_meta, t_targets, toxic, gname)
            if len(group) == 0:
                continue
            res = ref_civil.eval_group(
                group, outputs, t_meta, t_targets, errors, confidences, lls, config
            )
            ref_cells[(gi, int(toxic))] = float(res["accuracy"])

    preds = np.asarray(outputs.argmax(dim=1))
    ours = worst_group_accuracy(preds, targets, meta)

    for (gi, label), ref_acc in ref_cells.items():
        key = f"acc_{CIVIL_GROUPS[gi]}_y{label}"
        assert key in ours, key
        np.testing.assert_allclose(ours[key], ref_acc, atol=1e-6, err_msg=key)

    # The reference's "worst group accuracy" (civil.py:86) is the min over
    # the identity-group cells PLUS the all / all-toxic / all-non-toxic
    # rows.
    correct = preds == targets
    all_rows = [
        float(correct.mean()),
        float(correct[targets == 0].mean()),
        float(correct[targets == 1].mean()),
    ]
    ref_worst = min(min(ref_cells.values()), min(all_rows))
    np.testing.assert_allclose(ours["worst_group_acc"], ref_worst, atol=1e-6)


def test_civil_worst_includes_aggregate_rows():
    """Adversarial case where the aggregate rows are the minimum: every
    identity-flagged example is predicted correctly, every groupless one
    wrong — the reference's worst (civil.py:86 mins over all /
    all-toxic / all-non-toxic too) must drop below every identity cell."""
    from beyond_deep_ensembles_tpu.data.wilds import worst_group_accuracy

    rng = np.random.RandomState(9)
    n = 400
    targets = rng.randint(0, 2, size=n)
    meta = np.zeros((n, 8), np.int64)
    meta[: n // 2] = rng.binomial(1, 0.5, size=(n // 2, 8))
    has_group = meta.sum(axis=1) > 0
    preds = np.where(has_group, targets, 1 - targets)

    ours = worst_group_accuracy(preds, targets, meta)
    # identity cells are all perfect; the aggregates are not
    cell_accs = [v for k, v in ours.items() if k.startswith("acc_") and "_all_" not in k]
    assert min(cell_accs) == 1.0
    correct = preds == targets
    expected = min(
        float(correct.mean()),
        float(correct[targets == 0].mean()),
        float(correct[targets == 1].mean()),
    )
    np.testing.assert_allclose(ours["worst_group_acc"], expected, atol=1e-9)
    assert ours["worst_group_acc"] < 1.0
