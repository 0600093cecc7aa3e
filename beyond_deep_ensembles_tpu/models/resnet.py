"""CIFAR-style ResNets with swappable layer types (plain / BBB / Rank-1),
norms (batch-static / FRN / variational-FRN) and activations (relu/swish).

Reference src/architectures/resnet.py (adapted there from
akamaster/pytorch_resnet_cifar10). NHWC layout throughout.

Notes vs the reference:
  * "batch_static" norm means BatchNorm WITHOUT running statistics —
    batch stats are used even at eval (reference resnet.py:21,
    ``track_running_stats=False``), reproduced here by always normalizing
    with the current batch; no mutable state needed.
  * ResNet20-FRN-swish matches the Wilson-HMC architecture
    (SURVEY.md §2.2).
  * The reference's from-scratch ``Bottleneck``/``ResNet50``
    (resnet.py:86-213) are structurally broken (stride-1 blocks add
    tensors of different channel counts; 1x1 convs carry padding=1) and
    are never exercised by the experiments (iWildCam/RxRx1 use pretrained
    torchvision ResNet-50s). We implement a *correct* bottleneck ResNet-50
    instead: skip projections whenever shape changes, standard paddings.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.dropout import FixableDropout
from ..nn.frn import FilterResponseNorm, VariationalFilterResponseNorm
from ..nn.norm import StaticBatchNorm
from .layers import call_layer, make_conv, make_dense


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "swish":
        return nn.swish
    raise ValueError(f"unknown activation {name!r}")


class _Norm(nn.Module):
    """norm in {'batch_static', 'frn', 'frn_variational'}
    (reference get_norm_layer, resnet.py:19-28)."""

    kind: str

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "none":
            # norm removed entirely — a benchmark decomposition variant
            # (big_backbones *_nonorm rows measure the norm/elementwise
            # share of the conv-backbone step), never a training default
            return x
        if self.kind == "batch_static":
            # track_running_stats=False: batch statistics at eval too.
            return StaticBatchNorm()(x, train=train)
        if self.kind == "frn":
            return FilterResponseNorm()(x, train=train)
        if self.kind == "frn_variational":
            return VariationalFilterResponseNorm()(x, train=train)
        raise ValueError(f"unknown norm {self.kind!r}")


def _norm_kind(norm: str, conv_kind: str) -> str:
    # Variational FRN only for the BBB variant (reference resnet.py:23-26:
    # rank1 falls back to plain FRN).
    if norm == "frn" and conv_kind == "bbb":
        return "frn_variational"
    return norm


class BasicBlock(nn.Module):
    """Reference BasicBlock (resnet.py:56-84)."""

    features: int
    stride: int = 1
    activation: str = "relu"
    norm: str = "batch_static"
    dropout_p: Optional[float] = None
    conv_kind: str = "plain"
    components: int = 1
    dtype: jnp.dtype = jnp.float32
    norm_bound: float = 6.0  # spectral conv_kind only

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        act = _activation(self.activation)
        nk = _norm_kind(self.norm, self.conv_kind)

        def drop(h):
            if self.dropout_p is not None:
                return FixableDropout(self.dropout_p)(h, train=train)
            return h

        def conv(h, features, kernel, stride, padding, use_bias=True):
            kw = {"dtype": self.dtype} if self.conv_kind in ("plain", "bbb") else {}
            if self.conv_kind == "spectral":
                kw["norm_bound"] = self.norm_bound
            layer = make_conv(
                self.conv_kind,
                features,
                (kernel, kernel),
                strides=stride,
                padding=padding,
                use_bias=use_bias,
                components=self.components,
                **kw,
            )
            return call_layer(layer, h, train, component)

        h = conv(x, self.features, 3, self.stride, 1)
        h = drop(h)
        h = _Norm(nk)(h, train=train)
        h = act(h)
        h = conv(h, self.features, 3, 1, 1)
        h = drop(h)
        h = _Norm(nk)(h, train=train)

        if self.stride != 1:
            skip = conv(x, self.features, 1, self.stride, 0, use_bias=False)
            skip = drop(skip)
        else:
            skip = x
        return act(h + skip)


class PreBasicBlock(nn.Module):
    """Reference PreBasicBlock (resnet.py:217-242): norm-act-conv order."""

    features: int
    stride: int = 1
    activation: str = "relu"
    norm: str = "batch_static"
    dropout_p: Optional[float] = None
    conv_kind: str = "plain"
    components: int = 1
    norm_bound: float = 6.0  # spectral conv_kind only

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        act = _activation(self.activation)
        nk = _norm_kind(self.norm, self.conv_kind)

        def drop(h):
            if self.dropout_p is not None:
                return FixableDropout(self.dropout_p)(h, train=train)
            return h

        def conv(h, features, kernel, stride, padding, use_bias=True):
            kw = {"norm_bound": self.norm_bound} if self.conv_kind == "spectral" else {}
            layer = make_conv(
                self.conv_kind,
                features,
                (kernel, kernel),
                strides=stride,
                padding=padding,
                use_bias=use_bias,
                components=self.components,
                **kw,
            )
            return call_layer(layer, h, train, component)

        h = _Norm(nk)(x, train=train)
        h = act(h)
        h = drop(h)
        h = conv(h, self.features, 3, self.stride, 1)
        h = _Norm(nk)(h, train=train)
        h = act(h)
        h = drop(h)
        h = conv(h, self.features, 3, 1, 1)

        if self.stride != 1:
            skip = drop(x)
            skip = conv(skip, self.features, 1, self.stride, 0, use_bias=False)
        else:
            skip = x
        return h + skip


class Bottleneck(nn.Module):
    """Standard bottleneck (1x1 reduce, 3x3, 1x1 expand); projection skip
    whenever shape changes. The reference's version is broken — see module
    docstring.

    torchvision=True reproduces torchvision's resnet50 block exactly
    (bias-free convs, BatchNorm after the downsample projection, v1.5
    stride placement on the 3x3) so pretrained torchvision checkpoints
    transplant with logit parity (reference iwildcam/models.py:171,
    rxrx1/models.py:21 use torchvision.models.resnet50 pretrained)."""

    features: int  # output channels (= 4 * bottleneck width)
    stride: int = 1
    activation: str = "relu"
    norm: str = "batch_static"
    dropout_p: Optional[float] = None
    conv_kind: str = "plain"
    components: int = 1
    torchvision: bool = False
    dropout_freeze_eval: bool = True
    dtype: jnp.dtype = jnp.float32
    norm_bound: float = 6.0  # spectral conv_kind only

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        act = _activation(self.activation)
        nk = _norm_kind(self.norm, self.conv_kind)
        width = self.features // 4

        def drop(h):
            if self.dropout_p is not None:
                return FixableDropout(
                    self.dropout_p, freeze_on_eval=self.dropout_freeze_eval
                )(h, train=train)
            return h

        def conv(h, features, kernel, stride, padding, use_bias=True):
            kw = {"dtype": self.dtype} if self.conv_kind in ("plain", "bbb") else {}
            if self.conv_kind == "spectral":
                kw["norm_bound"] = self.norm_bound
            layer = make_conv(
                self.conv_kind,
                features,
                (kernel, kernel),
                strides=stride,
                padding=padding,
                use_bias=use_bias,
                components=self.components,
                **kw,
            )
            return call_layer(layer, h, train, component)

        bias = not self.torchvision  # torchvision convs are bias-free
        h = conv(x, width, 1, 1, 0, use_bias=bias)
        h = drop(h)
        h = _Norm(nk)(h, train=train)
        h = act(h)
        h = conv(h, width, 3, self.stride, 1, use_bias=bias)
        h = drop(h)
        h = _Norm(nk)(h, train=train)
        h = act(h)
        h = conv(h, self.features, 1, 1, 0, use_bias=bias)
        h = drop(h)
        h = _Norm(nk)(h, train=train)

        if self.stride != 1 or x.shape[-1] != self.features:
            skip = conv(x, self.features, 1, self.stride, 0, use_bias=False)
            skip = drop(skip)
            if self.torchvision:
                skip = _Norm(nk)(skip, train=train)
        else:
            skip = x
        return act(h + skip)


class ResNet20(nn.Module):
    """Reference ResNet20 (resnet.py:122-148); with norm='frn',
    activation='swish' this is the Wilson-HMC CIFAR architecture."""

    classes: int
    activation: str = "relu"
    norm: str = "batch_static"
    dropout_p: Optional[float] = None
    conv_kind: str = "plain"
    head_kind: Optional[str] = None  # defaults to conv_kind
    components: int = 1
    features_only: bool = False  # return pooled features (SNGP featurizer cut)
    dtype: jnp.dtype = jnp.float32  # compute dtype for conv/dense (bf16 on TPU)
    norm_bound: float = 6.0  # spectral conv_kind only

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        kw = {"dtype": self.dtype} if self.conv_kind in ("plain", "bbb") else {}
        if self.conv_kind == "spectral":
            kw["norm_bound"] = self.norm_bound
        stem = make_conv(
            self.conv_kind, 16, (3, 3), strides=1, padding=1, components=self.components, **kw
        )
        h = call_layer(stem, x, train, component)
        if self.dropout_p is not None:
            h = FixableDropout(self.dropout_p)(h, train=train)

        widths = [(16, 1), (16, 1), (16, 1), (32, 2), (32, 1), (32, 1), (64, 2), (64, 1), (64, 1)]
        for features, stride in widths:
            h = BasicBlock(
                features,
                stride,
                self.activation,
                self.norm,
                self.dropout_p,
                self.conv_kind,
                self.components,
                dtype=self.dtype,
                norm_bound=self.norm_bound,
            )(h, train=train, component=component)

        in_size = x.shape[1]
        if in_size >= 32:
            h = nn.avg_pool(h, (8, 8), strides=(8, 8))
        h = h.reshape(h.shape[0], -1)
        if self.features_only:
            return h
        head = make_dense(self.head_kind or self.conv_kind, self.classes, components=self.components)
        return call_layer(head, h, train, component)


class WilsonResNet20(nn.Module):
    """Faithful port of the VENDORED bnn-hmc ResNet-20 (reference
    google-bnn-hmc/bnn_hmc/utils/models.py:95-176 make_resnet_fn) — the
    architecture of the published Wilson-et-al HMC samples.

    It differs from the torch reference's ResNet20 (resnet.py:122-148,
    our ``ResNet20``): the stem is conv+FRN+activation (not bare conv),
    and the downsample shortcut is a biased 1x1 conv followed by FRN
    (the torch one is bias-free with no norm). 107 parameter leaves vs 96.

    Modules are named ``conv_{i}`` / ``frn_{i}`` in creation order —
    exactly haiku's ``conv2_d{,_i}`` / ``frn{,_i}`` instance numbering —
    so checkpoint conversion is a deterministic name map, not shape
    guessing (``data/wilson.py convert_wilson_sample``)."""

    classes: int = 10
    activation: str = "swish"
    width: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        act = _activation(self.activation)
        he_normal = nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"
        )
        counter = iter(range(100))

        def layer(h, features, kernel=3, stride=1, activation=lambda v: v):
            i = next(counter)
            h = nn.Conv(
                features,
                (kernel, kernel),
                strides=(stride, stride),
                padding="SAME",
                use_bias=True,
                kernel_init=he_normal,
                name=f"conv_{i}",
            )(h)
            h = FilterResponseNorm(name=f"frn_{i}")(h)
            return activation(h)

        num_filters = self.width
        h = layer(x, num_filters, activation=act)
        for stack in range(3):
            for block in range(3):
                stride = 2 if (stack > 0 and block == 0) else 1
                y = layer(h, num_filters, stride=stride, activation=act)
                y = layer(y, num_filters)
                if stack > 0 and block == 0:
                    h = layer(h, num_filters, kernel=1, stride=stride)
                h = act(h + y)
            num_filters *= 2
        h = nn.avg_pool(h, (8, 8), strides=(8, 8))
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.classes, kernel_init=he_normal, name="linear")(h)


class PreResNet20(nn.Module):
    """Reference PreResNet20 (resnet.py:244-272)."""

    classes: int
    activation: str = "relu"
    norm: str = "batch_static"
    dropout_p: Optional[float] = None
    conv_kind: str = "plain"
    head_kind: Optional[str] = None  # defaults to conv_kind
    components: int = 1
    features_only: bool = False  # return pooled features (SNGP featurizer cut)
    dtype: jnp.dtype = jnp.float32  # compute dtype for conv/dense (bf16 on TPU)

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        stem = make_conv(
            self.conv_kind, 16, (3, 3), strides=1, padding=1, components=self.components
        )
        h = call_layer(stem, x, train, component)

        widths = [(16, 1), (16, 1), (16, 1), (32, 2), (32, 1), (32, 1), (64, 2), (64, 1), (64, 1)]
        for features, stride in widths:
            h = PreBasicBlock(
                features,
                stride,
                self.activation,
                self.norm,
                self.dropout_p,
                self.conv_kind,
                self.components,
            )(h, train=train, component=component)

        h = _Norm(_norm_kind(self.norm, self.conv_kind))(h, train=train)
        h = _activation(self.activation)(h)
        if x.shape[1] >= 32:
            h = nn.avg_pool(h, (8, 8), strides=(8, 8))
        h = h.reshape(h.shape[0], -1)
        if self.features_only:
            return h
        head = make_dense(self.head_kind or self.conv_kind, self.classes, components=self.components)
        return call_layer(head, h, train, component)


class ResNet18(nn.Module):
    """Reference ResNet18 (resnet.py:150-176): 3x3 stem, maxpool 3/2,
    global average pool head. PovertyMap uses this with 8 input channels
    and one regression output."""

    classes: int
    activation: str = "relu"
    norm: str = "batch_static"
    dropout_p: Optional[float] = None
    conv_kind: str = "plain"
    head_kind: Optional[str] = None  # defaults to conv_kind
    components: int = 1
    features_only: bool = False  # return pooled features (SNGP featurizer cut)
    dtype: jnp.dtype = jnp.float32  # compute dtype for conv/dense (bf16 on TPU)
    norm_bound: float = 6.0  # spectral conv_kind only

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        kw = {"dtype": self.dtype} if self.conv_kind in ("plain", "bbb") else {}
        if self.conv_kind == "spectral":
            kw["norm_bound"] = self.norm_bound
        stem = make_conv(
            self.conv_kind, 64, (3, 3), strides=1, padding=1, components=self.components, **kw
        )
        h = call_layer(stem, x, train, component)
        if self.dropout_p is not None:
            h = FixableDropout(self.dropout_p)(h, train=train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        widths = [(64, 1), (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2), (512, 1)]
        for features, stride in widths:
            h = BasicBlock(
                features,
                stride,
                self.activation,
                self.norm,
                self.dropout_p,
                self.conv_kind,
                self.components,
                dtype=self.dtype,
                norm_bound=self.norm_bound,
            )(h, train=train, component=component)

        h = jnp.mean(h, axis=(1, 2))
        if self.features_only:
            return h
        head = make_dense(self.head_kind or self.conv_kind, self.classes, components=self.components)
        return call_layer(head, h, train, component)


class ResNet50(nn.Module):
    """Corrected bottleneck ResNet-50 (see module docstring)."""

    classes: int
    activation: str = "relu"
    norm: str = "batch_static"
    dropout_p: Optional[float] = None
    conv_kind: str = "plain"
    head_kind: Optional[str] = None  # defaults to conv_kind
    components: int = 1
    features_only: bool = False  # return pooled features (SNGP featurizer cut)
    dtype: jnp.dtype = jnp.float32  # compute dtype for conv/dense (bf16 on TPU)
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    torchvision: bool = False  # exact torchvision topology for weight transplant
    # pretrained-backbone tasks use proper (rescaled, per-example) eval
    # dropout (reference iwildcam/models.py:75 freeze_on_eval=False);
    # from-scratch uses of this class keep the reference default True
    dropout_freeze_eval: bool = True
    norm_bound: float = 6.0  # spectral conv_kind only
    # 'none' | 'block' | 'stage' — activation rematerialization. At the
    # reference's 448px iWildCam resolution the saved per-block
    # activations dominate HBM traffic; 'block' checkpoints each
    # Bottleneck (saves only the 16 block inputs), 'stage' checkpoints
    # each of the 4 stages (saves 4 inputs, recomputes a whole stage in
    # backward). Measured A/B in benchmarks/big_backbones.py. Ignored
    # when a mixture component index is threaded (rank-1/MultiX).
    remat: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True, component=None):
        kw = {"dtype": self.dtype} if self.conv_kind in ("plain", "bbb") else {}
        if self.conv_kind == "spectral":
            kw["norm_bound"] = self.norm_bound
        stem = make_conv(
            self.conv_kind,
            64,
            (7, 7),
            strides=2,
            padding=3,
            components=self.components,
            use_bias=not self.torchvision,
            **kw,
        )
        h = call_layer(stem, x, train, component)
        if self.torchvision:
            h = _Norm(_norm_kind(self.norm, self.conv_kind))(h, train=train)
            h = _activation(self.activation)(h)
        if self.dropout_p is not None:
            h = FixableDropout(
                self.dropout_p, freeze_on_eval=self.dropout_freeze_eval
            )(h, train=train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # skip remat during eager init (jax.checkpoint would trace+eval
        # every block, inflating host-side init from ms to minutes) and
        # under a mixture component index — see the field comment
        remat = (
            self.remat
            if component is None and not self.is_initializing()
            else "none"
        )
        block_cls = Bottleneck
        if remat == "block":
            # prevent_cse stays ON (default) — see models/densenet.py:
            # without the barrier XLA CSE undoes the remat entirely.
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))
        # explicit names pinned to the no-remat auto-naming (nn.remat
        # renames the class to CheckpointBottleneck, which would shift
        # parameter paths and break the torchvision transplant map)
        block_counter = iter(range(sum(self.stage_sizes)))

        for stage, blocks in enumerate(self.stage_sizes):
            features = 256 * (2**stage)

            def stage_fn(mdl, h, stage=stage, blocks=blocks, features=features):
                del mdl  # children attach to self (we run in self's scope)
                for block in range(blocks):
                    stride = 2 if (stage > 0 and block == 0) else 1
                    h = block_cls(
                        features,
                        stride,
                        self.activation,
                        self.norm,
                        self.dropout_p,
                        self.conv_kind,
                        self.components,
                        torchvision=self.torchvision,
                        dropout_freeze_eval=self.dropout_freeze_eval,
                        dtype=self.dtype,
                        name=f"Bottleneck_{next(block_counter)}",
                    )(h, train, component)
                return h

            if remat == "stage":
                h = nn.remat(stage_fn)(self, h)
            else:
                h = stage_fn(self, h)

        h = jnp.mean(h, axis=(1, 2))
        if self.features_only:
            return h
        head = make_dense(self.head_kind or self.conv_kind, self.classes, components=self.components)
        return call_layer(head, h, train, component)
