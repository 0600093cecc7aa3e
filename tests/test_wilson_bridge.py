"""Wilson HMC checkpoint bridge: differential proof against the LIVE
vendored haiku code (google-bnn-hmc/bnn_hmc/utils/models.py
resnet20_frn_swish, built with the installed haiku) and the published
checkpoint layout (one state-<i>.pkl per sample with a leading 3-chain
axis on every leaf, reference src/wilson.py:47-56)."""
import os
import pickle
import sys

import numpy as np
import pytest

VENDORED = "/root/reference/google-bnn-hmc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VENDORED), reason="vendored bnn-hmc not available"
)

hk = pytest.importorskip("haiku")
if VENDORED not in sys.path:
    sys.path.insert(0, VENDORED)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beyond_deep_ensembles_tpu.data.wilson import (  # noqa: E402
    WilsonHMC,
    convert_wilson_sample,
)
from beyond_deep_ensembles_tpu.models.resnet import WilsonResNet20  # noqa: E402
from beyond_deep_ensembles_tpu.nn.base import Model  # noqa: E402


def _haiku_model():
    from bnn_hmc.utils import models as hk_models

    return hk_models.get_model("resnet20_frn_swish", {"num_classes": 10})


def _haiku_init(seed):
    net_apply, net_init = _haiku_model()
    x = jnp.zeros((1, 32, 32, 3))
    params, state = net_init(jax.random.PRNGKey(seed), (x, None), True)
    return net_apply, params, state


def test_conversion_logit_parity_vs_live_haiku():
    """convert_wilson_sample on a GENUINE haiku resnet20_frn_swish tree
    must reproduce the haiku forward bit-for-bit — the dozens of
    identically-shaped (C,) FRN leaves make shape-greedy matching the
    exact silent-cross-assignment bug class this name map eliminates."""
    net_apply, hparams, hstate = _haiku_init(0)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 3))

    model = Model(WilsonResNet20(classes=10, activation="swish"))
    template, ms = model.init(jax.random.key(0), x)
    assert len(jax.tree.leaves(template)) == len(jax.tree.leaves(hparams)) == 107

    converted = convert_wilson_sample(hparams, template)
    ours, _, _ = model.apply(converted, ms, None, x, train=False, mutable_state=False)
    ref = net_apply(hparams, hstate, None, (x, None), False)[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_conversion_is_name_exact_not_shape_greedy():
    """Permuting two same-shaped FRN modules' values must permute the
    converted output accordingly (i.e. conversion keys on NAMES)."""
    _, hparams, _ = _haiku_init(1)
    model = Model(WilsonResNet20(classes=10, activation="swish"))
    template, _ = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    converted = convert_wilson_sample(hparams, template)

    # swap frn_1 and frn_2 (same shapes) in the source
    swapped = dict(hparams)
    swapped["frn_1"], swapped["frn_2"] = hparams["frn_2"], hparams["frn_1"]
    converted_sw = convert_wilson_sample(swapped, template)
    np.testing.assert_allclose(
        np.asarray(converted_sw["frn_1"]["tau"]),
        np.asarray(converted["frn_2"]["tau"]),
    )
    np.testing.assert_allclose(
        np.asarray(converted_sw["frn_2"]["beta"]),
        np.asarray(converted["frn_1"]["beta"]),
    )


def test_published_checkpoint_layout_loads(tmp_path, monkeypatch):
    """Write state-<i>.pkl files in the PUBLISHED format (3-chain leading
    axis, {'params', 'net_state'} dict — reference wilson.py:47-56) and
    check WilsonHMC loads chains x samples and matches per-chain haiku
    forwards."""
    net_apply, p0, hstate = _haiku_init(0)
    _, p1, _ = _haiku_init(1)
    _, p2, _ = _haiku_init(2)
    chains = [p0, p1, p2]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *chains)

    ckpt_dir = tmp_path / "wilson_hmc" / "cifar10"
    os.makedirs(ckpt_dir)
    for i in range(2):  # two "samples", same params (cheap)
        with open(ckpt_dir / f"state-{i}.pkl", "wb") as fh:
            pickle.dump(
                {
                    "params": jax.tree.map(np.asarray, stacked),
                    "net_state": {},
                    "iteration": i,
                },
                fh,
            )
    monkeypatch.setenv("BDE_DATA_DIR", str(tmp_path))

    hmc = WilsonHMC()
    assert hmc.n_samples == 6  # 2 samples x 3 chains

    x = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 32, 3))
    log_probs = hmc.infer(x)
    assert log_probs.shape == (6, 2, 10)
    # per-chain agreement with the live haiku forward
    for chain, params in enumerate(chains):
        ref = jax.nn.log_softmax(
            net_apply(params, hstate, None, (x, None), False)[0], axis=-1
        )
        np.testing.assert_allclose(
            np.asarray(log_probs[chain]), np.asarray(ref), atol=2e-5
        )
    # sample 1's chains repeat sample 0's (same params written twice)
    np.testing.assert_allclose(
        np.asarray(log_probs[3:]), np.asarray(log_probs[:3]), atol=1e-6
    )


def test_legacy_chain_dir_layout_still_loads(tmp_path, monkeypatch):
    _, params, _ = _haiku_init(4)
    cdir = tmp_path / "wilson_hmc" / "chain0"
    os.makedirs(cdir)
    with open(cdir / "sample0.pkl", "wb") as fh:
        pickle.dump({"params": jax.tree.map(np.asarray, params)}, fh)
    monkeypatch.setenv("BDE_DATA_DIR", str(tmp_path))
    hmc = WilsonHMC()
    assert hmc.n_samples == 1
    lp = hmc.infer(jnp.zeros((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(lp)).all()
