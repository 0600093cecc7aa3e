"""bf16 compute-dtype threading through the big backbones.

The reference trains its large models under torch AMP (GradScaler plumbing,
reference src/algos/algo.py:44-80); the TPU-native equivalent is bf16
compute with fp32 parameters and no scaler (SURVEY.md §7 "bf16 policy").
These tests pin that the ``dtype`` knob actually reaches every matmul-
bearing layer (output dtype) and that bf16 outputs stay close to the fp32
reference — i.e. norm/softmax statistics still accumulate in fp32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyond_deep_ensembles_tpu.models.bert import (
    BertClassifier,
    DistilBertConfig,
)
from beyond_deep_ensembles_tpu.models.densenet import DenseNetClassifier
from beyond_deep_ensembles_tpu.models.resnet import ResNet18, ResNet50
from beyond_deep_ensembles_tpu.nn.base import Model


def _compare(module_fp32, module_bf16, x, *, tol, key=0):
    m32, m16 = Model(module_fp32), Model(module_bf16)
    params, ms = m32.init(jax.random.key(key), x)
    out32, _, _ = m32.apply(params, ms, None, x, train=False)
    out16, _, _ = m16.apply(params, ms, None, x, train=False)
    # params are shared (fp32 master weights); only compute dtype differs
    assert out16.dtype == jnp.float32  # heads are kept fp32
    assert np.all(np.isfinite(np.asarray(out16)))
    # normalize by the overall output scale: per-element relative error is
    # meaningless for random-init logits that straddle zero
    a32, a16 = np.asarray(out32), np.asarray(out16)
    scale = max(np.abs(a32).max(), 1e-3)
    rel = np.max(np.abs(a16 - a32)) / scale
    assert rel < tol, f"bf16 drifted {rel:.4f} from fp32 (tol {tol})"


def test_bert_bf16_matches_fp32():
    cfg = DistilBertConfig(
        vocab_size=512, dim=64, n_layers=2, n_heads=2, hidden_dim=128,
        dropout=0.1, attention_dropout=0.1,
    )
    x = jnp.stack(
        [
            jax.random.randint(jax.random.key(1), (4, 16), 0, 512),
            jnp.ones((4, 16), jnp.int32),
        ],
        axis=-1,
    )
    _compare(
        BertClassifier(classes=5, config=cfg),
        BertClassifier(classes=5, config=cfg, dtype=jnp.bfloat16),
        x,
        tol=0.15,
    )


def test_bert_bf16_train_attention_path():
    """The unfused attention path (attention dropout active in training)
    must also run in bf16 with fp32 score accumulation."""
    cfg = DistilBertConfig(
        vocab_size=512, dim=64, n_layers=1, n_heads=2, hidden_dim=128,
        dropout=0.0, attention_dropout=0.1,
    )
    model = Model(BertClassifier(classes=3, config=cfg, dtype=jnp.bfloat16))
    x = jnp.stack(
        [
            jax.random.randint(jax.random.key(1), (2, 8), 0, 512),
            jnp.ones((2, 8), jnp.int32),
        ],
        axis=-1,
    )
    params, ms = model.init(jax.random.key(0), x)
    out, _, _ = model.apply(params, ms, jax.random.key(2), x, train=True)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_resnet50_bf16_matches_fp32():
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    _compare(
        ResNet50(classes=7, stage_sizes=(1, 1), torchvision=True),
        ResNet50(classes=7, stage_sizes=(1, 1), torchvision=True, dtype=jnp.bfloat16),
        x,
        tol=0.2,
    )


def test_resnet18_bf16_finite():
    model = Model(ResNet18(classes=1, dtype=jnp.bfloat16))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 8))
    params, ms = model.init(jax.random.key(0), x)
    out, _, _ = model.apply(params, ms, None, x, train=False)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_densenet_bf16_matches_fp32():
    kw = dict(
        classes=4, growth_rate=4, block_config=(2, 2), init_features=8, bn_size=2
    )
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    _compare(
        DenseNetClassifier(**kw),
        DenseNetClassifier(**kw, dtype=jnp.bfloat16),
        x,
        tol=0.2,
    )


@pytest.mark.parametrize("conv_kind", ["bbb"])
def test_resnet50_bbb_head_bf16(conv_kind):
    """head-only BBB on a bf16 backbone (the ll_bbb / head-only wilds
    scope) initializes and applies."""
    model = Model(
        ResNet50(
            classes=3,
            stage_sizes=(1, 1),
            conv_kind="plain",
            head_kind=conv_kind,
            dtype=jnp.bfloat16,
        )
    )
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    params, ms = model.init(jax.random.key(0), x)
    out, kl, _ = model.apply(params, ms, jax.random.key(2), x, train=True)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
