"""CIFAR-10 (+ STL-10-shaped, + CIFAR-10-C corrupted) data.

Reference experiments/base/cifar.py: Wilson-et-al normalization
(MEAN=(0.49,0.48,0.44), STD=(0.2,0.2,0.2), cifar.py:10-12), train-time
random crop (pad 4) + horizontal flip (cifar.py:16-22), per-intensity
corrupted test splits from the CIFAR-10-C npy dump (cifar.py:58-71),
class exclusion and subsampling knobs (cifar.py:31-38,50-56).

TPU-native departure: augmentation is a JITTABLE BATCH FUNCTION
(:func:`augment`) executed on device inside the training step — no host
worker pool. Arrays are NHWC float32, already normalized.

Sources: ``$BDE_DATA_DIR/cifar-10-batches-py`` (the standard python
pickle batches) and ``$BDE_DATA_DIR/CIFAR-10-C/*.npy``; hermetic
synthetic stand-ins otherwise.
"""
from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .uci import data_dir

MEAN = np.asarray([0.49, 0.48, 0.44], np.float32)
STD = np.asarray([0.2, 0.2, 0.2], np.float32)

CORRUPTIONS = [
    "gaussian_noise",
    "shot_noise",
    "impulse_noise",
    "defocus_blur",
    "glass_blur",
    "motion_blur",
    "zoom_blur",
    "snow",
    "frost",
    "fog",
    "brightness",
    "contrast",
    "elastic_transform",
    "pixelate",
    "jpeg_compression",
]


def normalize(images_uint8_or_float: np.ndarray) -> np.ndarray:
    """uint8 [N,32,32,3] or float in [0,1] -> normalized float32 NHWC."""
    x = np.asarray(images_uint8_or_float, np.float32)
    if x.max() > 2.0:
        x = x / 255.0
    return (x - MEAN) / STD


def _synthetic_cifar(n: int, seed: int, classes: int = 10, hard: Optional[bool] = None):
    """Class-structured blobs: each class gets a color direction + spatial
    frequency so that small convnets can actually fit it. Class
    prototypes come from a FIXED rng so train/test splits share them
    (per-split seeds only drive sampling noise).

    ``hard`` (default: env ``BDE_SYNTH_HARD=1``) makes the task
    non-separable so convergence artifacts mean something: each image is
    a random convex mix of its class prototype and a random OTHER class
    prototype (overlapping class-conditionals), and 10% of labels are
    resampled uniformly. Bayes error is therefore bounded away from
    zero and calibration metrics (NLL/ECE) are informative — a model
    reporting accuracy 1.0 on this variant is a bug, not a success."""
    if hard is None:
        hard = os.environ.get("BDE_SYNTH_HARD", "0") == "1"
    rng = np.random.RandomState(seed)
    y = rng.randint(0, classes, size=n)
    base = np.random.RandomState(1234).randn(classes, 4, 4, 3).astype(np.float32)
    imgs = base[y]
    if hard:
        # overlapping class-conditionals: mix in a random other class
        # prototype with weight up to 0.55 (ambiguous at mix≈0.5)
        other = base[(y + 1 + rng.randint(0, classes - 1, size=n)) % classes]
        mix = rng.uniform(0.45, 1.0, size=(n, 1, 1, 1)).astype(np.float32)
        imgs = mix * imgs + (np.float32(1.0) - mix) * other
    imgs = imgs.repeat(8, axis=1).repeat(8, axis=2)
    # float32 throughout: the build host is single-core and float64
    # promotion on 600 MB arrays costs minutes.
    noise = np.random.default_rng(seed + 1).standard_normal(
        size=(n, 32, 32, 3), dtype=np.float32
    )
    imgs = np.float32(0.5) + np.float32(0.15) * imgs + np.float32(0.1) * noise
    np.clip(imgs, 0, 1, out=imgs)
    if hard:
        # 10% label noise, resampled uniformly (so ~10%*(C-1)/C flipped)
        flip = rng.rand(n) < 0.1
        y = np.where(flip, rng.randint(0, classes, size=n), y)
    return imgs, y.astype(np.int64)


def _load_python_batches(root: str, train: bool):
    names = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    xs, ys = [], []
    for name in names:
        with open(os.path.join(root, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        ys.append(np.asarray(d[b"labels"], np.int64))
    return np.concatenate(xs), np.concatenate(ys)


def load_cifar10(
    train: bool,
    exclude_classes: Sequence[int] = (),
    subsample: Optional[int] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (normalized images NHWC float32, labels int64)."""
    root = os.path.join(data_dir(), "cifar-10-batches-py")
    if os.path.exists(root):
        x, y = _load_python_batches(root, train)
        x = normalize(x)
    else:
        n = 50_000 if train else 10_000
        if subsample is not None:
            n = min(n, max(subsample * 2, 512))
        x, y = _synthetic_cifar(n, seed + (0 if train else 1))
        x = normalize(x)
    if exclude_classes:
        keep = ~np.isin(y, list(exclude_classes))
        x, y = x[keep], y[keep]
    if subsample is not None:
        x, y = x[:subsample], y[:subsample]
    return x, y


def load_stl10_test(
    subsample: Optional[int] = None, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """STL-10 test split resized to 32x32 with the same normalization —
    the reference's OOD split for CIFAR models (cifar.py:16-17,46-48).
    Source: ``$BDE_DATA_DIR/stl10_binary/{test_X.bin,test_y.bin}``;
    synthetic CIFAR-like fallback otherwise."""
    root = os.path.join(data_dir(), "stl10_binary")
    xp, yp = os.path.join(root, "test_X.bin"), os.path.join(root, "test_y.bin")
    if os.path.exists(xp) and os.path.exists(yp):
        x = np.fromfile(xp, np.uint8).reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1)
        y = np.fromfile(yp, np.uint8).astype(np.int64) - 1
        # 96 -> 32: 3x3 average pooling (the reference uses PIL resize)
        x = x.reshape(-1, 32, 3, 32, 3, 3).mean(axis=(2, 4)).astype(np.float32)
        x = normalize(x)
    else:
        x, y = _synthetic_cifar(2048, seed + 5)
        x = normalize(x)
    if subsample is not None:
        x, y = x[:subsample], y[:subsample]
    return x, y


def load_cifar10_corrupted(
    intensity: int, subsample: Optional[int] = None, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """All corruption types at one intensity in {0..4}, concatenated
    (reference cifar.py:58-71). Synthetic fallback: the clean test set
    plus intensity-scaled Gaussian noise per corruption type."""
    root = os.path.join(data_dir(), "CIFAR-10-C")
    if os.path.exists(root):
        labels = np.load(os.path.join(root, "labels.npy")).astype(np.int64)
        # the Hendrycks dump stacks 5 intensities of the 10k test set per
        # file (50k rows); infer the block so uniformly-reduced dumps also
        # load — but validate the layout, or a truncated dump would be
        # silently served as the wrong intensity
        if len(labels) % 5 != 0:
            raise ValueError(
                f"CIFAR-10-C labels.npy has {len(labels)} rows — not a "
                "5-intensity stack; re-stage the dump"
            )
        block = len(labels) // 5
        sel = slice(intensity * block, (intensity + 1) * block)
        xs, ys = [], []
        for file in sorted(os.listdir(root)):
            if file == "labels.npy":
                continue
            arr = np.load(os.path.join(root, file)).astype(np.float32) / 256.0
            if len(arr) != len(labels):
                raise ValueError(
                    f"CIFAR-10-C {file} has {len(arr)} rows but labels.npy "
                    f"has {len(labels)} — mismatched dump"
                )
            xs.append((arr[sel] - MEAN) / STD)
            ys.append(labels[sel])
        x, y = np.concatenate(xs), np.concatenate(ys)
    else:
        x, y = load_cifar10(train=False, seed=seed)
        rng = np.random.RandomState(seed + 100 + intensity)
        xs, ys = [], []
        for c, _ in enumerate(CORRUPTIONS[:3]):  # keep the fallback small
            noise = rng.randn(*x.shape).astype(np.float32)
            xs.append(x + 0.1 * (intensity + 1) * noise)
            ys.append(y)
        x, y = np.concatenate(xs), np.concatenate(ys)
    if subsample is not None:
        x, y = x[:subsample], y[:subsample]
    return x, y


def augment(key: jax.Array, images: jax.Array) -> jax.Array:
    """Random crop (zero-pad 4) + horizontal flip, batched and jittable —
    runs on device inside the train step (reference host-side transform
    cifar.py:16-22).

    Both crops are expressed as second-axis ``take_along_axis`` gathers
    over a COLLAPSED trailing layout (the w crop after an h<->w
    transpose), because TPU gather throughput is set by the trailing
    ("lane") dimension: a vmapped per-image ``dynamic_slice`` or any
    gather whose trailing dims are the raw ``(w, 3)`` runs at ~3/128
    lane efficiency — measured ~1.0 s for one 50k-image CIFAR bulk
    pass on v5e — while the same gathers over ``(h+8, (w+8)*c)``-shaped
    views are bandwidth-bound: 51 ms for the whole pass, 19x faster
    (transposes are free — layout assignment). The horizontal flip is
    folded into the column indices, so it costs nothing. Bit-identical
    to the dynamic_slice formulation for the same key (same RNG draws,
    same zero padding) — pinned by tests/test_aux.py.
    """
    b, h, w, c = images.shape
    k_crop, k_flip = jax.random.split(key)
    offsets = jax.random.randint(k_crop, (b, 2), 0, 9)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))

    rows = offsets[:, 0:1] + jnp.arange(h)[None, :]  # [b, h]
    cols = offsets[:, 1:2] + jnp.arange(w)[None, :]  # [b, w]
    cols = jnp.where(flip[:, None], cols[:, ::-1], cols)

    padded = jnp.pad(images, ((0, 0), (4, 4), (4, 4), (0, 0)))
    out = jnp.take_along_axis(
        padded.reshape(b, h + 8, (w + 8) * c), rows[:, :, None], axis=1
    ).reshape(b, h, w + 8, c)
    out = jnp.swapaxes(out, 1, 2)  # [b, w+8, h, c]
    out = jnp.take_along_axis(
        out.reshape(b, w + 8, h * c), cols[:, :, None], axis=1
    ).reshape(b, w, h, c)
    return jnp.swapaxes(out, 1, 2)


def batch_iter(
    x: np.ndarray,
    y: np.ndarray,
    batch_size: int,
    rng: Optional[np.random.RandomState] = None,
    drop_remainder: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    n = x.shape[0]
    idx = np.arange(n) if rng is None else rng.permutation(n)
    end = n - (n % batch_size) if drop_remainder else n
    for start in range(0, end, batch_size):
        sel = idx[start : start + batch_size]
        yield x[sel], y[sel]
