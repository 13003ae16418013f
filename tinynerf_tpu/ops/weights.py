"""Per-ray transmittance / rendering-weights op — the framework's hot kernel.

This is the TPU-native rebuild of the reference's single native component, the
CUDA `compute_weights` fwd/bwd kernels (reference src/cuda.cu:3-58): per ray,
with alpha_k = exp(-sigma_k * delta_k),

    w_k = T_k * (1 - alpha_k),      T_k = prod_{j<k} alpha_j,

with early termination once T drops below a threshold (remaining weights are
exactly zero), and the closed-form backward

    dL/dsigma_i = delta_i * (T_{i+1} g_i - sum_{k>i} w_k g_k).

Layout: the reference runs one CUDA thread per ray over a packed ragged array.
On TPU the scan lives in a DENSE [n_rays, n_samples] layout (invalid samples
masked to sigma*delta = 0, i.e. alpha = 1, which contributes nothing — exactly
the packed semantics).  The per-ray scan is then a row-wise cumulative sum,
which XLA vectorizes across rays on the VPU; early termination becomes a mask
(T <= threshold => w = 0), turning a data-dependent loop exit into branch-free
vector math.  A fused Pallas kernel with identical semantics lives in
`weights_pallas.py`; this file is the semantic contract and the autodiff
wrapper both implementations share.

All functions take `mask` as float32 (1.0 = valid) so the custom VJP has a
well-defined (zero) cotangent for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def compute_weights_naive(sigmas, deltas, maskf, threshold=0.0):
    """Straight-line jnp implementation — differentiable via plain autodiff.

    Used as the numeric ground truth in tests; not called in the hot path.
    """
    s = sigmas * deltas * maskf
    c_incl = jnp.cumsum(s, axis=-1)
    t_before = jnp.exp(-(c_incl - s))  # transmittance BEFORE sample k
    alpha = 1.0 - jnp.exp(-s)
    w = t_before * alpha
    return jnp.where((maskf > 0.0) & (t_before > threshold), w, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def compute_weights(sigmas, deltas, maskf, threshold=1e-4):
    """Rendering weights with the closed-form backward (gradients flow to
    `sigmas` only; `deltas`/`maskf` get zero cotangents, matching the
    reference autograd bridge that returns None for steps/info)."""
    return compute_weights_naive(sigmas, deltas, maskf, threshold)


def _weights_fwd(sigmas, deltas, maskf, threshold):
    w = compute_weights_naive(sigmas, deltas, maskf, threshold)
    return w, (sigmas, deltas, maskf, w)


def _weights_bwd(threshold, res, g):
    sigmas, deltas, maskf, w = res
    s = sigmas * deltas * maskf
    wg = w * g
    incl = jnp.cumsum(wg, axis=-1)
    total = incl[..., -1:]
    # acc_k = -sum_{j>k} w_j g_j   (reference src/cuda.cu:49-53 vectorized)
    acc = incl - total
    t_incl = jnp.exp(-jnp.cumsum(s, axis=-1))  # transmittance AFTER sample k
    grad_sigmas = deltas * (acc + t_incl * g) * maskf
    return grad_sigmas, jnp.zeros_like(deltas), jnp.zeros_like(maskf)


compute_weights.defvjp(_weights_fwd, _weights_bwd)
