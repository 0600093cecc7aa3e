"""SVGD pairwise-RBF / Stein-direction kernels.

The SVGD hot spot is O(n^2 P) over the (n particles, P parameters) matrix
— P can be ~25M for ResNet-50 while n <= ~20 (reference svgd.py:14-32,
SURVEY.md §3.3). Two passes over P are information-theoretically required
(the median-heuristic bandwidth depends on ALL pairwise distances before
phi can be formed), so the design is:

  pass 1: Gram matrix X @ X^T tiled over P (Pallas kernel below, fp32
          accumulation in VMEM scratch; or one XLA matmul);
  host-free median: exact quantile of the n^2 distances on device;
  pass 2: phi = M1 @ G + M2 @ X where M1 = K, M2 = c (diag(Ksum) - K) —
          algebraically folding the reference's three terms (svgd.py:23,89)
          into ONE [n, 2n] @ [2n, P] matmul, reading X and G exactly once.

Both passes are HBM-bandwidth-bound and the XLA path already runs at
speed of light; the Pallas Gram kernel exists to keep the fused-accumulate
path explicit and to serve as the template for larger fused variants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_PALLAS_MIN_P = 1 << 15  # below this, plain XLA wins on dispatch overhead


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gram_kernel(x_ref, out_ref, acc_ref):
    """Accumulate X_tile @ X_tile^T over the P grid into VMEM scratch."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        x,
        x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def _gram_pallas(x: jax.Array, tile_p: int = 512, interpret: bool = False) -> jax.Array:
    n, p = x.shape
    n_pad = _round_up(max(n, 8), 8)
    p_pad = _round_up(p, tile_p)
    x = jnp.pad(x, ((0, n_pad - n), (0, p_pad - p)))
    grid = (p_pad // tile_p,)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, tile_p), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad), jnp.float32)],
        interpret=interpret,
    )(x)
    return out[:n, :n]


def _use_pallas_default(p: int) -> bool:
    return p >= _PALLAS_MIN_P and jax.default_backend() == "tpu"


def pairwise_sq_dists(x: jax.Array, use_pallas: bool | None = None) -> jax.Array:
    """Squared euclidean distances between rows of x: [n, n]
    (reference svgd.py:15 ``torch.cdist(...)**2``)."""
    x = x.astype(jnp.float32)
    if use_pallas is None:
        use_pallas = _use_pallas_default(x.shape[1])
    if use_pallas:
        gram = _gram_pallas(x)
    else:
        gram = jax.lax.dot_general(
            x,
            x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    sq = jnp.diagonal(gram)
    return jnp.maximum(sq[:, None] + sq[None, :] - 2 * gram, 0.0)


def _median_linear(values: jax.Array) -> jax.Array:
    """Exact 0.5-quantile with linear interpolation over all entries
    (torch.quantile default semantics, reference svgd.py:18)."""
    flat = jnp.sort(values.reshape(-1))
    m = flat.shape[0]
    pos = 0.5 * (m - 1)
    lo = int(pos)
    frac = pos - lo
    hi = min(lo + 1, m - 1)
    return flat[lo] * (1.0 - frac) + flat[hi] * frac


def rbf_phi(
    particles: jax.Array,
    grads: jax.Array,
    kernel_grad_scale: float,
    dataset_size: int,
    h_override=None,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Full Stein direction phi for all particles.

    particles, grads: [n, P] (grads already include the L2 prior term).
    Returns phi [n, P] = K @ (-grads) + scale * grad_K / dataset_size
    (reference svgd.py:86-89), computed as one [n, 2n] @ [2n, P] matmul.
    """
    particles = particles.astype(jnp.float32)
    grads = grads.astype(jnp.float32)
    n = particles.shape[0]

    d2 = pairwise_sq_dists(particles, use_pallas=use_pallas)
    if h_override is None:
        h = jnp.sqrt(0.5 * _median_linear(d2) / jnp.log(n + 1.0)) + 1e-8
    else:
        h = jnp.asarray(h_override, jnp.float32)

    kernel = jnp.exp(-d2 / (2.0 * h**2))
    c = kernel_grad_scale / (h**2) / dataset_size
    ksum = jnp.sum(kernel, axis=1)
    m1 = -kernel  # multiplies grads
    m2 = c * (jnp.diag(ksum) - kernel)  # multiplies particles
    combined = jnp.concatenate([m1, m2], axis=1)  # [n, 2n]
    stacked = jnp.concatenate([grads, particles], axis=0)  # [2n, P]
    return jax.lax.dot_general(
        combined,
        stacked,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
