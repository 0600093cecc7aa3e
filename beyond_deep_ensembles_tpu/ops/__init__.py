"""Hand-written TPU kernels (Pallas) and fused ops for the hot paths."""
from .svgd_kernel import pairwise_sq_dists, rbf_phi  # noqa: F401
