"""Config-driven DenseNet (DenseNet-121 shape for Camelyon17/FMoW).

Reference src/architectures/densenet.py:98-210: dense layers
(norm-relu-1x1 conv-norm-relu-3x3 conv with bottleneck width
bn_size * growth), transitions halving channels, BatchNorm whose
``track_running_stats`` is a config switch (densenet.py:124-125 — the
"static BN" mode evaluates with batch statistics and is the
accuracy-critical setting per BASELINE.md), and a separate
ClassificationHead whose linear is plain/BBB/Rank-1.

NHWC. Dense connectivity keeps a single growing feature tensor instead
of the reference's Python list-of-tensors (densenet.py:150-154) — one
concat per layer, XLA-friendly.

TPU note on ``remat``: dense connectivity saves every intermediate
concat tensor for the backward pass — O(L^2) activation bytes per dense
block, which is HBM traffic, the measured bottleneck for DenseNet-121
training on v5e (benchmarks/big_backbones.py densenet121_* rows).
``remat='block'`` checkpoints each dense block, saving only the four
block inputs and recomputing the forward inside the block during the
backward; ``remat='layer'`` checkpoints each DenseLayer (keeps the
concat chain saved, drops only intra-layer BN/conv intermediates).
Both are measured A/B on the real chip — see big_backbones results.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.dropout import FixableDropout
from ..nn.norm import StaticBatchNorm, channel_stats
from .layers import call_layer, make_conv, make_dense


class _BN(nn.Module):
    track_running_stats: bool = False
    off: bool = False  # benchmark decomposition only (*_nonorm rows)

    @nn.compact
    def __call__(self, x, train: bool = True, stats=None):
        if self.off:
            return x
        if self.track_running_stats:
            # running-stats mode keeps its EMA bookkeeping; the stats
            # cache only applies to the static path
            return nn.BatchNorm(use_running_average=not train)(x)
        # static BN: batch statistics always (reference util.py:204-218)
        return StaticBatchNorm()(x, train=train, stats=stats)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    conv_kind: str = "plain"
    components: int = 1
    dropout_p: Optional[float] = None
    track_running_stats: bool = False
    dropout_freeze_eval: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU)
    norm_off: bool = False  # benchmark decomposition only

    @nn.compact
    def __call__(self, x, train: bool = True, component=None, bn_stats=None):
        kw = {"dtype": self.dtype} if self.conv_kind in ("plain", "bbb") else {}

        def drop(h):
            if self.dropout_p is not None:
                return FixableDropout(
                    self.dropout_p, freeze_on_eval=self.dropout_freeze_eval
                )(h, train=train)
            return h

        # bn_stats: cached per-channel stats of x (DenseNet incremental_bn)
        h = _BN(self.track_running_stats, self.norm_off)(x, train=train, stats=bn_stats)
        h = nn.relu(h)
        h = call_layer(
            make_conv(
                self.conv_kind,
                self.bn_size * self.growth_rate,
                (1, 1),
                use_bias=False,
                components=self.components,
                **kw,
            ),
            h,
            train,
            component,
        )
        h = drop(h)
        h = _BN(self.track_running_stats, self.norm_off)(h, train=train)
        h = nn.relu(h)
        h = call_layer(
            make_conv(
                self.conv_kind,
                self.growth_rate,
                (3, 3),
                padding=1,
                use_bias=False,
                components=self.components,
                **kw,
            ),
            h,
            train,
            component,
        )
        return drop(h)


class DenseNet(nn.Module):
    """Feature extractor returning pooled features [B, out_features]
    (reference DenseNet, densenet.py:166-202). DenseNet-121:
    growth_rate=32, block_config=(6,12,24,16), init_features=64,
    bn_size=4 (experiments/camelyon/models.py:41)."""

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    init_features: int = 64
    bn_size: int = 4
    conv_kind: str = "plain"
    components: int = 1
    dropout_p: Optional[float] = None
    track_running_stats: bool = False
    # camelyon's from-scratch DenseNet keeps the reference default
    # (frozen-mask eval); the fmow pretrained-densenet task passes False
    # (reference fmow/models.py:73 freeze_on_eval=False)
    dropout_freeze_eval: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU)
    # 'none' | 'layer' | 'block' — activation rematerialization for the
    # backward pass (module docstring). Ignored when a mixture component
    # index is threaded (rank-1/MultiX), where the capture would have to
    # be lifted explicitly; those paths never enable it.
    remat: str = "none"
    # Reuse per-channel batch statistics across the dense block: layer
    # j+1's input is concat(input_j, new_j), whose per-channel stats over
    # (B, H, W) are BY CONSTRUCTION the stats already computed for
    # input_j plus the stats of new_j — so each layer's input BN (and
    # each transition/final BN) only reduces over the 32 NEW channels
    # instead of the whole growing tensor. Exact: same values, same
    # gradient (the cached stats are the same function of the same
    # producers); pinned by tests/test_remat_backbones.py
    # test_densenet_incremental_bn_exact. Static-BN mode only.
    incremental_bn: bool = True
    norm_off: bool = False  # benchmark decomposition only (*_nonorm rows)
    # 'concat' | 'buffer' — how the dense block grows its feature tensor.
    # 'concat' re-concatenates per layer (each concat copies the whole
    # growing tensor into a fresh buffer — O(L^2) copy bytes per block);
    # 'buffer' preallocates the block's final-width tensor once and
    # writes each layer's 32 new channels with a static-offset
    # dynamic_update_slice (XLA can apply the update in place), layers
    # reading static prefix slices that fuse into their consumers.
    # Numerically EXACT either way (same values, same gradient function);
    # measured A/B: big_backbones densenet121_map_buffer row.
    concat_mode: str = "concat"

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        kw = {"dtype": self.dtype} if self.conv_kind in ("plain", "bbb") else {}
        h = call_layer(
            make_conv(
                self.conv_kind,
                self.init_features,
                (7, 7),
                strides=2,
                padding=3,
                use_bias=False,
                components=self.components,
                **kw,
            ),
            x,
            train,
            component,
        )
        h = _BN(self.track_running_stats, self.norm_off)(h, train=train)
        h = nn.relu(h)
        if self.dropout_p is not None:
            h = FixableDropout(
                self.dropout_p, freeze_on_eval=self.dropout_freeze_eval
            )(h, train=train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # remat only matters under jit-of-grad; during (eager, host-side)
        # init jax.checkpoint would trace+interpret every layer, turning
        # a milliseconds init into minutes — skip it there. Mixture paths
        # (component index) skip it too, see the field comment.
        remat = (
            self.remat
            if component is None and not self.is_initializing()
            else "none"
        )
        layer_cls = DenseLayer
        if remat == "layer":
            # prevent_cse stays ON (default): the layers are a Python
            # loop, not a lax.scan over layers, so without the barrier
            # XLA CSE merges the recompute back into the saved forward
            # and silently undoes the remat (measured: identical HLO
            # flops with prevent_cse=False).
            layer_cls = nn.remat(DenseLayer, static_argnums=(2,))
        # explicit names pinned to the no-remat auto-naming (nn.remat
        # renames the class to CheckpointDenseLayer, which would shift
        # every parameter path and break checkpoint converters)
        layer_counter = iter(range(sum(self.block_config)))

        use_inc = (
            self.incremental_bn
            and not self.track_running_stats
            and not self.norm_off
        )
        stats = None

        for i, n_layers in enumerate(self.block_config):

            use_buffer = self.concat_mode == "buffer"

            def block_fn(mdl, h, stats, n_layers=n_layers):
                del mdl  # children attach to self (we run in self's scope)
                c = h.shape[-1]
                if use_buffer:
                    buf = jnp.zeros(
                        h.shape[:-1] + (c + n_layers * self.growth_rate,),
                        h.dtype,
                    )
                    buf = jax.lax.dynamic_update_slice(
                        buf, h, (0,) * h.ndim
                    )
                for _ in range(n_layers):
                    cur = (
                        jax.lax.slice_in_dim(buf, 0, c, axis=-1)
                        if use_buffer
                        else h
                    )
                    new = layer_cls(
                        self.growth_rate,
                        self.bn_size,
                        self.conv_kind,
                        self.components,
                        self.dropout_p,
                        self.track_running_stats,
                        dropout_freeze_eval=self.dropout_freeze_eval,
                        dtype=self.dtype,
                        norm_off=self.norm_off,
                        name=f"DenseLayer_{next(layer_counter)}",
                    )(cur, train, component, stats)
                    if stats is not None:
                        # only the 32 new channels need a reduction pass
                        nm, nv = channel_stats(new)
                        stats = (
                            jnp.concatenate([stats[0], nm]),
                            jnp.concatenate([stats[1], nv]),
                        )
                    if use_buffer:
                        buf = jax.lax.dynamic_update_slice(
                            buf, new, (0,) * (new.ndim - 1) + (c,)
                        )
                    else:
                        h = jnp.concatenate([h, new], axis=-1)
                    c += self.growth_rate
                return (buf if use_buffer else h), stats

            stats0 = channel_stats(h) if use_inc else None
            if remat == "block":
                h, stats = nn.remat(block_fn)(self, h, stats0)
            else:
                h, stats = block_fn(self, h, stats0)
            if i != len(self.block_config) - 1:
                # Transition (reference densenet.py:156-164)
                t = _BN(self.track_running_stats, self.norm_off)(h, train=train, stats=stats)
                t = nn.relu(t)
                t = call_layer(
                    make_conv(
                        self.conv_kind,
                        h.shape[-1] // 2,
                        (1, 1),
                        use_bias=False,
                        components=self.components,
                        **kw,
                    ),
                    t,
                    train,
                    component,
                )
                h = nn.avg_pool(t, (2, 2), strides=(2, 2))

        h = _BN(self.track_running_stats, self.norm_off)(h, train=train, stats=stats)
        h = nn.relu(h)
        return jnp.mean(h, axis=(1, 2))


class DenseNetClassifier(nn.Module):
    """DenseNet + ClassificationHead (reference densenet.py:204-210)."""

    classes: int
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    init_features: int = 64
    bn_size: int = 4
    conv_kind: str = "plain"
    head_kind: str = "plain"
    components: int = 1
    dropout_p: Optional[float] = None
    track_running_stats: bool = False
    dropout_freeze_eval: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU)
    remat: str = "none"  # see DenseNet.remat
    incremental_bn: bool = True  # see DenseNet.incremental_bn
    norm_off: bool = False  # benchmark decomposition only
    concat_mode: str = "concat"  # see DenseNet.concat_mode

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        h = DenseNet(
            self.growth_rate,
            self.block_config,
            self.init_features,
            self.bn_size,
            self.conv_kind,
            self.components,
            self.dropout_p,
            self.track_running_stats,
            dropout_freeze_eval=self.dropout_freeze_eval,
            dtype=self.dtype,
            remat=self.remat,
            incremental_bn=self.incremental_bn,
            norm_off=self.norm_off,
            concat_mode=self.concat_mode,
        )(x, train=train, component=component)
        # head matmul is a rounding error of the flops: keep it fp32
        h = h.astype(jnp.float32)
        head = make_dense(self.head_kind, self.classes, components=self.components)
        return call_layer(head, h, train, component)
