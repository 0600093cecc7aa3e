"""Native C++ data pipeline (native/batcher.cc via ctypes): gather
correctness vs numpy, shuffle coverage, PrefetchLoader epoch semantics,
and the pure-python fallback path."""
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.data import native_loader as NL


def test_native_library_builds_and_loads():
    # the shared library must be buildable on this image (g++ + make)
    assert NL._load_library() is not None


def test_gather_rows_matches_numpy():
    rng = np.random.RandomState(0)
    for dtype in (np.float32, np.uint8, np.int64):
        src = (rng.rand(64, 5, 3) * 100).astype(dtype)
        idx = rng.randint(0, 64, size=37)
        np.testing.assert_array_equal(NL.gather_rows(src, idx), src[idx])


def test_gather_rows_fallback(monkeypatch):
    monkeypatch.setattr(NL, "_LIB", None)
    monkeypatch.setattr(NL, "_LIB_TRIED", True)
    src = np.arange(24, dtype=np.float32).reshape(6, 4)
    idx = np.array([5, 0, 3])
    np.testing.assert_array_equal(NL.gather_rows(src, idx), src[idx])


def test_shuffled_indices_is_permutation_and_seeded():
    a = NL.shuffled_indices(100, seed=7)
    b = NL.shuffled_indices(100, seed=7)
    c = NL.shuffled_indices(100, seed=8)
    np.testing.assert_array_equal(np.sort(a), np.arange(100))
    np.testing.assert_array_equal(a, b)  # deterministic per seed
    assert not np.array_equal(a, c)


def test_prefetch_loader_covers_every_row_once():
    x = np.arange(100, dtype=np.float32)[:, None]
    y = np.arange(100, dtype=np.int64)
    loader = NL.PrefetchLoader((x, y), batch_size=16, seed=3)
    assert len(loader) == 6  # drops the partial batch
    seen = []
    for xb, yb in loader.epoch(0):
        assert xb.shape == (16, 1) and yb.shape == (16,)
        np.testing.assert_array_equal(xb[:, 0].astype(np.int64), yb)
        seen.extend(yb.tolist())
    assert len(seen) == 96 and len(set(seen)) == 96  # no duplicates

    # different epoch -> different order; same epoch -> same order
    first = [yb.copy() for _, yb in loader.epoch(1)]
    again = [yb.copy() for _, yb in loader.epoch(1)]
    other = [yb.copy() for _, yb in loader.epoch(2)]
    np.testing.assert_array_equal(np.concatenate(first), np.concatenate(again))
    assert not np.array_equal(np.concatenate(first), np.concatenate(other))
