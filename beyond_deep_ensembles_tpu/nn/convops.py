"""2-D convolution primitive with pointwise (1x1) kernels lowered to
dot_general.

Two reasons, both TPU-first:

* **Correctness under member sharding.** XLA's SPMD partitioner in this
  jax version (0.9.0) MISCOMPILES a member-vmapped 1x1
  ``conv_general_dilated`` that consumes another convolution's output
  when the member axis is sharded over a mesh: outputs are
  deterministically wrong by O(activation scale), not fp noise
  (regression test
  tests/test_engine_parallel.py::test_pointwise_conv_member_sharding —
  chains like conv3x3 -> conv1x1 reproduce it; single convs and
  dot_general do not). Bottleneck/DenseNet architectures are built out
  of exactly such chains, so every 1x1 conv here takes the dot path.
* **Performance.** A 1x1 convolution IS a per-pixel matmul;
  ``dot_general`` lowers straight onto the MXU without the conv window
  machinery, which is also the layout XLA prefers for fusing the
  surrounding elementwise ops.

The lowering is exact (same contraction, same accumulation dtype): a
stride-s 1x1 conv reads only every s-th pixel, so subsampling first is
algebraically identical.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp


def _zero_padding(padding) -> bool:
    if isinstance(padding, str):
        return padding == "VALID"
    try:
        return all(tuple(p) == (0, 0) for p in padding)
    except TypeError:
        return False


def conv2d(
    lhs: jax.Array,
    rhs: jax.Array,
    strides: Sequence[int],
    padding: Union[str, Sequence],
    preferred_element_type: Optional[jnp.dtype] = None,
    precision=None,
) -> jax.Array:
    """NHWC x HWIO -> NHWC convolution; 1x1 kernels go through
    dot_general (see module docstring). ``lhs`` may carry extra leading
    batch dims (vmapped members) for the conv path only via vmap — this
    function itself expects rank-4 lhs."""
    kh, kw = int(rhs.shape[0]), int(rhs.shape[1])
    strides = tuple(strides)
    if kh == 1 and kw == 1 and _zero_padding(padding):
        if strides != (1, 1):
            lhs = lhs[:, :: strides[0], :: strides[1], :]
        out = jax.lax.dot_general(
            lhs,
            rhs[0, 0],
            (((lhs.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type,
            precision=precision,
        )
        return out
    return jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
        precision=precision,
    )
