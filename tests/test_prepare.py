"""Ingestion tooling: cache writers enforce the documented schema, the
loaders read what prepare wrote, verify_cache validates it
(reference download/staging: wilds1.py:155-156, experiments/uci/data.py:7-78)."""
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.data import prepare, uci as uci_data, wilds as W


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    monkeypatch.setenv("BDE_DATA_DIR", str(tmp_path))
    return str(tmp_path)


def test_wilds_cache_roundtrip(data_root):
    spec = W.TASKS["camelyon17"]
    n = 8
    x = np.random.rand(n, *spec.input_shape).astype(np.float32)
    y = np.random.randint(0, 2, n)
    meta = np.random.randint(0, 4, (n, 1))
    prepare.write_wilds_cache("camelyon17", "test", x, y, meta)
    xl, yl, ml = W.load_wilds("camelyon17", "test")
    assert xl.shape == x.shape and yl.dtype == np.int64
    np.testing.assert_allclose(xl, x)
    report = prepare.verify_cache(log=lambda *_: None)
    assert report["wilds/camelyon17_test.npz"] == "ok"


def test_wilds_cache_rescales_and_validates(data_root):
    spec = W.TASKS["camelyon17"]
    x255 = np.random.randint(0, 256, (4, *spec.input_shape)).astype(np.float32)
    prepare.write_wilds_cache("camelyon17", "val", x255, np.zeros(4), np.zeros((4, 1)))
    xl, _, _ = W.load_wilds("camelyon17", "val")
    assert xl.max() <= 1.0  # [0,255] inputs are rescaled to [0,1]

    with pytest.raises(ValueError, match="shape"):
        prepare.write_wilds_cache(
            "camelyon17", "test", np.zeros((2, 32, 32, 3)), np.zeros(2), np.zeros((2, 1))
        )
    with pytest.raises(ValueError, match="labels"):
        prepare.write_wilds_cache(
            "camelyon17",
            "test",
            np.zeros((2, *spec.input_shape)),
            np.array([0, 9]),
            np.zeros((2, 1)),
        )


def test_poverty_fold_cache(data_root):
    spec = W.TASKS["poverty"]
    n = 4
    x = np.random.rand(n, *spec.input_shape).astype(np.float32)
    y = np.random.randn(n, 1).astype(np.float32)
    meta = np.random.randint(0, 2, (n, 1))
    prepare.write_wilds_cache("poverty", "test_foldB", x, y, meta)
    xl, yl, _ = W.load_wilds("poverty", "test", fold="B")
    assert xl.shape == x.shape and yl.dtype == np.float32
    # other folds fall back to synthetic with fold-dependent seed
    xa, _, _ = W.load_wilds("poverty", "test", fold="A", subsample=4)
    assert not np.allclose(xa, xl)
    report = prepare.verify_cache(log=lambda *_: None)
    assert report["wilds/poverty_test_foldB.npz"] == "ok"


def test_text_task_cache(data_root):
    spec = W.TASKS["civilcomments"]
    n = 6
    ids = np.random.randint(0, 1000, (n, spec.seq_len))
    x = np.stack([ids, np.ones_like(ids)], axis=-1)
    meta = np.random.randint(0, 2, (n, 8))
    prepare.write_wilds_cache("civilcomments", "test", x, np.zeros(n), meta)
    xl, _, ml = W.load_wilds("civilcomments", "test")
    assert xl.dtype == np.int32 and ml.shape == (n, 8)


def test_poverty_standardized_floats_not_rescaled(data_root):
    """PovertyMap images are standardized floats (negative, >1): they
    must not be divided by 255 at write time nor flagged by verify
    (ADVICE r2)."""
    spec = W.TASKS["poverty"]
    n = 4
    x = (3.0 * np.random.randn(n, *spec.input_shape)).astype(np.float32)
    prepare.write_wilds_cache("poverty", "train", x, np.zeros((n, 1)), np.zeros((n, 1)))
    xl, _, _ = W.load_wilds("poverty", "train")
    np.testing.assert_allclose(xl, x)  # untouched
    report = prepare.verify_cache(log=lambda *_: None)
    assert report["wilds/poverty_train.npz"] == "ok"


def test_verify_parses_id_val_split(data_root):
    """amazon_id_val.npz must parse as task 'amazon', not 'amazon_id'
    (ADVICE r2)."""
    spec = W.TASKS["amazon"]
    ids = np.random.randint(0, 1000, (3, spec.seq_len))
    x = np.stack([ids, np.ones_like(ids)], axis=-1)
    prepare.write_wilds_cache("amazon", "id_val", x, np.zeros(3), np.zeros((3, 1)))
    report = prepare.verify_cache(log=lambda *_: None)
    assert report["wilds/amazon_id_val.npz"] == "ok"


def test_prepare_uci_from_raw_file(data_root, tmp_path):
    raw = tmp_path / "uci_raw"
    raw.mkdir()
    rng = np.random.RandomState(0)
    arr = rng.rand(30, 7)
    lines = ["# yacht hydrodynamics"] + [" ".join(f"{v:.5f}" for v in row) for row in arr]
    (raw / "yacht.data").write_text("\n".join(lines))
    prepare.prepare_uci("yacht", log=lambda *_: None)
    x, y = uci_data._load_uci("yacht")
    assert x.shape == (30, 6) and y.shape == (30, 1)
    np.testing.assert_allclose(x, arr[:, :-1].astype(np.float32), atol=1e-5)
    report = prepare.verify_cache(log=lambda *_: None)
    assert report["uci/yacht.npz"] == "ok"


def test_verify_cache_flags_corruption(data_root, tmp_path):
    import os

    os.makedirs(tmp_path / "uci", exist_ok=True)
    np.savez(tmp_path / "uci" / "bad.npz", x=np.full((3, 2), np.nan), y=np.zeros((3, 1)))
    report = prepare.verify_cache(log=lambda *_: None)
    assert report["uci/bad.npz"] != "ok"


def test_cli_verify_exits_clean(data_root, capsys):
    prepare.main(["verify"])  # empty cache -> "no staged datasets", rc 0
    assert "no staged datasets" in capsys.readouterr().out
