"""Fused self-attention with in-kernel dropout (Pallas, TPU).

Why this kernel exists: the reference's DistilBERT (HF
MultiHeadSelfAttention, reference src/architectures/bert.py:14-51 wraps
it) applies dropout to the attention PROBABILITIES. Under plain XLA that
placement blocks the fused-attention lowering, so the train step
materializes the [B, H, L, L] probabilities, the same-shaped dropout
mask, and their saved-for-backward copies in HBM. Measured on the real
v5e (benchmarks/results.json big_backbones): attention dropout costs
4.2 ms of the 20.3 ms DistilBERT-512 bs8 train step — the single largest
removable slice.

This kernel computes one (batch, head) attention panel entirely in VMEM:
scores -> masked softmax (fp32) -> dropout from the TPU hardware PRNG
(pltpu.prng_random_bits, no HBM mask traffic) -> probs @ V, with a
custom VJP whose backward kernel RECOMPUTES the probabilities and the
identical dropout mask (same per-(b,h) seed, same first-draw shape) —
flash-attention-style recompute, so nothing [L, L]-shaped ever touches
HBM in either direction.

Scope: whole-panel (no K/Q tiling), which bounds L by VMEM — fine
through L=1024; DistilBERT is L<=512. Requirements for the TPU path:
L % 128 == 0 and a TPU backend; callers fall back to
:func:`reference_dropout_attention` otherwise (exact same math, jax.random
mask — a different but equally iid stream, which is all dropout needs).

The dropout STREAM therefore differs from HF/torch (hardware PRNG vs
torch's Philox), which is immaterial for training statistics; the
e2e parity tracks run dropout-off or match realized masks explicitly.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # additive bias for masked keys; finite so (s - max) is NaN-free


def _dropout_keep(shape, dropout_p: float):
    """Bernoulli(1-p) keep mask from the per-core hardware PRNG.

    MUST be the first PRNG draw after prng_seed in both the forward and
    backward kernels (same shape, same call order) so the mask
    regenerates bit-identically in the backward pass.
    """
    bits = pltpu.prng_random_bits(shape)
    # int32 bits -> uniform [0, 1): identical mapping to ops/sampling.py
    u = (bits.astype(jnp.float32) + jnp.float32(2.0**31)) * jnp.float32(2.0**-32)
    return u >= jnp.float32(dropout_p)


def _panel_probs(q_ref, k_ref, bias_ref, scale, dropout_p):
    """Shared fwd/bwd recompute: masked softmax probs (fp32, pre-dropout)
    and the realized keep mask (or None when dropout_p == 0).

    Kernel-side layout is [B, H, L, D] so the (L, D) panel occupies the
    last two dims — the Mosaic lowering requires the blocked dims there."""
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    s = s + bias_ref[0, :, :]  # (L, L) + (1, L): key-padding bias broadcasts over rows
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    keep = _dropout_keep(p.shape, dropout_p) if dropout_p > 0.0 else None
    return p, keep


def _apply_drop(p, keep, dropout_p):
    if keep is None:
        return p
    return jnp.where(keep, p * jnp.float32(1.0 / (1.0 - dropout_p)), 0.0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *probs_ref,
                scale, dropout_p, n_heads):
    b, h = pl.program_id(0), pl.program_id(1)
    if dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * n_heads + h)
    p, keep = _panel_probs(q_ref, k_ref, bias_ref, scale, dropout_p)
    pd = _apply_drop(p, keep, dropout_p)
    v = v_ref[0, 0, :, :]
    o = jax.lax.dot_general(
        pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)
    if probs_ref:  # debug/test output: the realized (dropped) probabilities
        probs_ref[0][0, 0, :, :] = pd


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, dropout_p, n_heads):
    b, h = pl.program_id(0), pl.program_id(1)
    if dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * n_heads + h)
    # regenerates the forward's exact mask: same seed, same first draw
    p, keep = _panel_probs(q_ref, k_ref, bias_ref, scale, dropout_p)
    pd = _apply_drop(p, keep, dropout_p)
    v = v_ref[0, 0, :, :]
    do = do_ref[0, 0, :, :]
    cdt = v.dtype  # compute dtype of the [L,L] matmul operands (bf16 on TPU)
    # dV = dropped(P)^T @ dO
    dv = jax.lax.dot_general(
        pd.astype(cdt), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # d dropped(P) = dO @ V^T, then back through dropout's where/scale
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = _apply_drop(dpd, keep, dropout_p)
    # softmax backward: dS = P * (dP - rowsum(dP * P))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds.astype(cdt)
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _specs(B, L, H, D):
    # arrays are [B, H, L, D] / [B, 1, L] kernel-side: the blocked (L, D)
    # and (1, L) windows sit in the trailing two dims as Mosaic requires
    panel = pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0))
    bias = pl.BlockSpec((1, 1, L), lambda b, h: (b, 0, 0))
    return panel, bias


def _fwd_call(q, k, v, bias, seed, dropout_p, return_probs=False,
              interpret=False):
    # q/k/v here are kernel-layout [B, H, L, D]; bias is [B, 1, L]
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    panel, bias_spec = _specs(B, L, H, D)
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [panel]
    if return_probs:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, L, L), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, L, L), lambda b, h: (b, h, 0, 0)))
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, dropout_p=float(dropout_p), n_heads=H
        ),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            panel, panel, panel, bias_spec,
        ],
        out_specs=out_specs if return_probs else out_specs[0],
        out_shape=out_shapes if return_probs else out_shapes[0],
        interpret=interpret,
    )(seed, q, k, v, bias)
    return outs


def _bwd_call(q, k, v, bias, seed, dropout_p, do, interpret=False):
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    panel, bias_spec = _specs(B, L, H, D)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, dropout_p=float(dropout_p), n_heads=H
        ),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            panel, panel, panel, bias_spec, panel,
        ],
        out_specs=[panel, panel, panel],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(seed, q, k, v, bias, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attend(q, k, v, bias, seed, dropout_p, interpret):
    out = _fwd_call(q, k, v, bias, seed, dropout_p, interpret=interpret)
    return out


def _attend_fwd(q, k, v, bias, seed, dropout_p, interpret):
    out = _fwd_call(q, k, v, bias, seed, dropout_p, interpret=interpret)
    return out, (q, k, v, bias, seed)


def _attend_bwd(dropout_p, interpret, res, do):
    q, k, v, bias, seed = res
    dq, dk, dv = _bwd_call(q, k, v, bias, seed, dropout_p, do,
                           interpret=interpret)
    return (
        dq, dk, dv,
        jnp.zeros_like(bias),
        np.zeros(seed.shape, dtype=jax.dtypes.float0),
    )


_attend.defvjp(_attend_fwd, _attend_bwd)


def fused_dropout_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array,
    seed: jax.Array,
    *,
    dropout_p: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention with dropout on the probabilities, fused in VMEM.

    q/k/v: [B, L, H, D] (flax layout); key_mask: [B, L] nonzero = attend;
    seed: int32 [1] — fold a fresh value in per step (the per-(b, h)
    streams derive from it). Differentiable in q/k/v with the dropout
    mask held fixed between forward and backward.

    The kernel works on [B, H, L, D] panels (Mosaic wants the blocked
    window in the trailing two dims); the transposes below are cheap
    relative to the [L, L] HBM round-trips they eliminate, and XLA
    usually folds them into the surrounding reshapes.
    """
    bias = jnp.where(key_mask > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    out = _attend(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), bias, seed.astype(jnp.int32),
        float(dropout_p), interpret,
    )
    return out.transpose(0, 2, 1, 3)


def fused_attention_available(L: int, backend: Optional[str] = None) -> bool:
    """TPU path requirements: TPU backend, lane-aligned panel, VMEM-sized
    whole-panel recompute (see module docstring)."""
    backend = backend or jax.default_backend()
    return backend == "tpu" and L % 128 == 0 and L <= 1024


def fused_dropout_attention_debug(q, k, v, key_mask, seed, *, dropout_p,
                                  interpret=False):
    """Forward-only variant that also returns the realized (dropped,
    normalized) probabilities [B, H, L, L] — test/debug only; the
    production path never materializes them."""
    bias = jnp.where(key_mask > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    out, probs = _fwd_call(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), bias, seed.astype(jnp.int32), dropout_p,
        return_probs=True, interpret=interpret,
    )
    return out.transpose(0, 2, 1, 3), probs


def reference_dropout_attention(q, k, v, key_mask, rng, *, dropout_p,
                                train=True):
    """Pure-XLA fallback with identical math (jax.random dropout stream).

    Mirrors HF MultiHeadSelfAttention: scores / sqrt(D), key-padding mask,
    softmax, dropout on the probabilities, probs @ V.
    """
    B, L, H, D = q.shape
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.float32(D))
    s = jnp.where(key_mask[:, None, None, :] > 0, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_p > 0.0 and train:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
    out = jnp.einsum("bhlm,bmhd->blhd", p.astype(q.dtype), v)
    return out
