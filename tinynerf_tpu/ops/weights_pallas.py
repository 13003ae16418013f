"""Pallas TPU kernel for the per-ray transmittance/weights op.

This is the TPU-native counterpart of the reference's only native component,
the CUDA compute_weights fwd/bwd kernels (reference src/cuda.cu:3-58).  Same
semantic contract as ops/weights.py (the jnp implementation is the ground
truth; tests assert bit-level agreement in interpret mode).

Kernel design:
  * dense [n_rays, n_samples] layout; rays on the sublane axis (one program
    block = ROWS_PER_BLOCK rays x all samples in VMEM), samples on the lane
    axis.  The per-ray scan is a cumulative sum ALONG LANES, computed with a
    log2(S) shift-and-add (Hillis-Steele) sweep of VPU ops — every ray in the
    block scans in parallel; nothing serializes across rays.
  * early termination is branch-free masking (T <= threshold => w = 0),
    matching the semantics of the reference's data-dependent loop exit.
  * forward fuses sigma*delta, both exps, and the masking into one VMEM pass
    (XLA would otherwise materialize the cumsum operand and result in HBM);
    backward fuses the weight-gradient suffix sum and the closed-form
    gradient (reference src/cuda.cu:49-56) the same way.

`interpret=True` is used automatically off-TPU so the whole suite runs on CPU.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_BLOCK = 256


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along the last (lane) axis.

    Hillis-Steele doubling: log2(S) rounds of shift-right-by-k + add.  The
    shift is a concatenation of a zero block and a static slice — both cheap
    lane-relayout ops on the VPU.
    """
    n = x.shape[-1]
    k = 1
    while k < n:
        pad = jnp.zeros(x.shape[:-1] + (k,), dtype=x.dtype)
        x = x + jnp.concatenate([pad, x[..., : n - k]], axis=-1)
        k *= 2
    return x


def _fwd_kernel(sig_ref, dlt_ref, msk_ref, out_ref, *, threshold: float):
    m = msk_ref[:]
    s = sig_ref[:] * dlt_ref[:] * m
    c_incl = _cumsum_lanes(s)
    t_before = jnp.exp(-(c_incl - s))
    w = t_before * (1.0 - jnp.exp(-s))
    keep = (m > 0.0) & (t_before > threshold)
    out_ref[:] = jnp.where(keep, w, 0.0)


def _bwd_kernel(sig_ref, dlt_ref, msk_ref, w_ref, g_ref, out_ref):
    m = msk_ref[:]
    s = sig_ref[:] * dlt_ref[:] * m
    wg = w_ref[:] * g_ref[:]
    incl = _cumsum_lanes(wg)
    total = incl[..., -1:]
    t_incl = jnp.exp(-_cumsum_lanes(s))
    out_ref[:] = dlt_ref[:] * (incl - total + t_incl * g_ref[:]) * m


def _row_blocked_call(kernel, n_inputs: int, x0: jax.Array, *rest, interpret):
    """Launch `kernel` over row blocks of identically-shaped [R, S] arrays."""
    r, s = x0.shape
    blk = min(ROWS_PER_BLOCK, r)
    grid = (pl.cdiv(r, blk),)
    spec = pl.BlockSpec((blk, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, s), x0.dtype),
        grid=grid,
        in_specs=[spec] * n_inputs,
        out_specs=spec,
        interpret=interpret,
    )(x0, *rest)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def compute_weights_pallas(sigmas, deltas, maskf, threshold=1e-4, interpret=None):
    """Drop-in replacement for ops.weights.compute_weights on [R, S] inputs."""
    w, _ = _fwd(sigmas, deltas, maskf, threshold, interpret)
    return w


def _fwd(sigmas, deltas, maskf, threshold, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    kernel = functools.partial(_fwd_kernel, threshold=threshold)
    w = _row_blocked_call(kernel, 3, sigmas, deltas, maskf, interpret=interpret)
    return w, (sigmas, deltas, maskf, w)


def _bwd(threshold, interpret, res, g):
    if interpret is None:
        interpret = not _on_tpu()
    sigmas, deltas, maskf, w = res
    grad_sigmas = _row_blocked_call(
        _bwd_kernel, 5, sigmas, deltas, maskf, w, g, interpret=interpret
    )
    return grad_sigmas, jnp.zeros_like(deltas), jnp.zeros_like(maskf)


compute_weights_pallas.defvjp(_fwd, _bwd)
