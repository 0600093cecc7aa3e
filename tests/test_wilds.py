"""WILDS task layer: official metrics, data shapes, tiny end-to-end runs
(camelyon DenseNet, civilcomments DistilBERT, poverty regression),
last-layer variants, converters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.data import wilds as W
from beyond_deep_ensembles_tpu.experiments import wilds_task


def test_macro_f1():
    preds = np.array([0, 0, 1, 1, 2])
    targets = np.array([0, 1, 1, 1, 2])
    # class0: tp1 fp1 fn0 -> f1=2/3; class1: tp2 fp0 fn1 -> 0.8; class2: 1.0
    np.testing.assert_allclose(
        W.macro_f1(preds, targets, 3), np.mean([2 / 3, 0.8, 1.0]), rtol=1e-6
    )


def test_worst_group_accuracy():
    preds = np.array([0, 1, 1, 0])
    targets = np.array([0, 1, 0, 0])
    meta = np.array([[1, 0], [1, 0], [1, 0], [0, 1]])[:, :2]
    out = W.worst_group_accuracy(preds, targets, meta)
    assert out["worst_group_acc"] <= out["accuracy"]
    assert out["acc_male_y0"] == 0.5  # points 0 (correct) and 2 (wrong)


def test_worst_region_accuracy():
    # region 0: both correct; region 1: 1/2; region 5 ("other"): all
    # wrong but excluded from the worst (reference fmow.py:70,84)
    preds = np.array([3, 3, 7, 7, 1, 1])
    targets = np.array([3, 3, 7, 2, 0, 0])
    meta = np.array([0, 0, 1, 1, 5, 5])[:, None]
    out = W.worst_region_accuracy(preds, targets, meta)
    assert out["worst_region_acc"] == 0.5
    assert out["acc_region_asia"] == 1.0
    assert out["acc_region_other"] == 0.0
    np.testing.assert_allclose(out["accuracy"], 3 / 6)
    # dispatched for fmow
    d = W.evaluate_task("fmow", preds, targets, meta)
    assert d["worst_region_acc"] == 0.5


def test_tenth_percentile_accuracy():
    # 20 users, user k has accuracy k/10 capped at 1 over 10 examples
    rng = np.random.RandomState(0)
    users, preds, targets = [], [], []
    accs = []
    for u in range(20):
        acc = min(u, 10) / 10
        accs.append(acc)
        for i in range(10):
            users.append(u)
            targets.append(1)
            preds.append(1 if i < acc * 10 else 0)
    preds, targets = np.array(preds), np.array(targets)
    meta = np.array(users)[:, None]
    out = W.tenth_percentile_accuracy(preds, targets, meta)
    assert out["n_users"] == 20
    np.testing.assert_allclose(
        out["10th_percentile_acc"], np.percentile(accs, 10), rtol=1e-9
    )
    assert out["worst_user_acc"] == 0.0
    d = W.evaluate_task("amazon", preds, targets, meta)
    assert "10th_percentile_acc" in d


def test_synthetic_seed_stable_across_processes():
    """The synthetic-fallback salt must not use Python's salted hash():
    train and eval phases run in separate processes and must see the
    same data (ADVICE r2)."""
    import subprocess
    import sys

    code = (
        "from beyond_deep_ensembles_tpu.data.wilds import load_wilds;"
        "import numpy as np;"
        "x,y,m = load_wilds('camelyon17','val',subsample=8);"
        "print(float(np.asarray(x, dtype=np.float64).sum()))"
    )
    outs = [
        subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        ).stdout.strip().splitlines()[-1]
        for _ in range(2)
    ]
    assert outs[0] == outs[1]


def test_pearson_and_poverty_metric():
    rng = np.random.RandomState(0)
    t = rng.randn(100)
    p = t + 0.1 * rng.randn(100)
    assert W.pearson_r(p, t) > 0.97
    urban = rng.randint(0, 2, 100)
    out = W.worst_urban_rural_pearson(p, t, urban)
    assert out["r_worst"] <= max(out["r_urban"], out["r_rural"]) + 1e-9


def test_load_shapes():
    for task in ["camelyon17", "civilcomments", "poverty"]:
        # subsample keeps the synthetic draw small (poverty is 224x224x8)
        x, y, meta = W.load_wilds(task, "test", subsample=16)
        spec = W.TASKS[task]
        assert x.shape[1:] == spec.input_shape
        assert len(x) == len(y) == len(meta) == 16
    x, y, meta = W.load_wilds("camelyon17", "train", subsample=0.25)
    assert len(x) == 512


TINY = {
    "tiny": True,
    "epochs": 1,
    "batch_size": 16,
    "eval_batch_size": 32,
    "eval_samples": 2,
    "subsample": 64,
    "test_subsample": 64,
    "swag_start_epoch": 0,
    "svgd_particles": 2,
}


@pytest.mark.slow
@pytest.mark.parametrize("model", ["map", "swag_ll", "ll_ivon"])
def test_camelyon_tiny_e2e(model):
    res = wilds_task.run_single("camelyon17", {**TINY, "model": model})
    assert "accuracy" in res and np.isfinite(res["accuracy"])
    assert np.isfinite(res["ece"])


@pytest.mark.slow
def test_civilcomments_bert_tiny():
    res = wilds_task.run_single("civilcomments", {**TINY, "model": "bbb"})
    assert "worst_group_acc" in res
    assert np.isfinite(res["avg_log_likelihood"])


@pytest.mark.slow
def test_poverty_regression_tiny():
    res = wilds_task.run_single("poverty", {**TINY, "model": "map"})
    assert "r_worst" in res and "avg_lml" in res
    assert np.isfinite(res["mse"])


def test_bbb_converter():
    from beyond_deep_ensembles_tpu.models.mlp import RegressionMLP
    from beyond_deep_ensembles_tpu.nn.base import Model
    from beyond_deep_ensembles_tpu.nn.convert import init_bbb_from_plain

    x = jnp.zeros((2, 4))
    plain = Model(RegressionMLP(hidden=8, dense_kind="plain"))
    bbb = Model(RegressionMLP(hidden=8, dense_kind="bbb"))
    p_plain, _ = plain.init(jax.random.key(0), x)
    p_bbb, _ = bbb.init(jax.random.key(1), x)
    merged = init_bbb_from_plain(p_bbb, p_plain)
    flat_plain = jax.tree_util.tree_flatten_with_path(p_plain)[0]
    # the Dense kernels became the gaussian means
    kern = [l for pth, l in flat_plain if "kernel" in str(pth[-1])]
    flat_merged = {
        str(tuple(str(k) for k in pth)): l
        for pth, l in jax.tree_util.tree_flatten_with_path(merged)[0]
    }
    matches = [
        np.allclose(np.asarray(v), np.asarray(kern[0]))
        for k, v in flat_merged.items()
        if "kernel__gmean" in k and v.shape == kern[0].shape
    ]
    assert any(matches)


def test_macro_f1_matches_sklearn_official_convention():
    # WILDS's iWildCam F1 is sklearn f1_score(average='macro') with
    # labels=None — macro-averaged over the UNION of labels observed in
    # targets or predictions (absent classes excluded). Differential
    # check against sklearn itself over randomized label sets.
    import warnings

    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    for _ in range(50):
        n_cls = rng.randint(2, 12)
        n = rng.randint(5, 200)
        preds = rng.randint(0, n_cls, n)
        targs = rng.randint(0, n_cls, n)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            expect = sklearn_metrics.f1_score(targs, preds, average="macro")
        np.testing.assert_allclose(W.macro_f1(preds, targs, n_cls), expect, atol=1e-12)


def test_pearson_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.RandomState(1)
    for _ in range(10):
        n = rng.randint(3, 100)
        a = rng.randn(n)
        b = 0.3 * a + rng.randn(n)
        np.testing.assert_allclose(
            W.pearson_r(a, b), scipy_stats.pearsonr(a, b)[0], rtol=1e-10
        )


def test_scheduled_lr_reaches_ivon_head():
    # fmow.py:154-158 decays BOTH the last-layer head's base optimizer
    # and the backbone with the same ExponentialLR; our engine routes the
    # schedule to the iVON head through its lr callable.
    cfg = {
        "lr_schedule_kind": "exponential",
        "steps_per_epoch": 2,
        "lr_decay_rate": 0.5,
        "epochs": 1,
    }
    f = wilds_task._scheduled_lr(cfg, 0.1)
    assert float(f(0)) == float(f(1)) == pytest.approx(0.1)
    assert float(f(2)) == float(f(3)) == pytest.approx(0.05)
    assert wilds_task._scheduled_lr({"lr_schedule_kind": "none"}, 0.1) == 0.1
