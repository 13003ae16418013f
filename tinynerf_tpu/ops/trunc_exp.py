"""Truncated exponential: exp with a gradient-explosion guard.

Semantics parity with the reference's TruncatedExponential autograd Function
(reference src/models.py:42-55, itself credited to torch-ngp): the forward is
a plain exp, the backward computes g * exp(clamp(x, -15, 15)) so that one
sample with a huge pre-activation cannot blow up the whole gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Trace-time A/B switch for the deviation-parity matrix (BASELINE.md): True =
# this framework's forward clamp; False = the reference's unclamped forward
# (src/models.py:47).  Read when a train step is traced, not per call.
FORWARD_CLAMP = True


def _fwd_value(x):
    if FORWARD_CLAMP:
        # the forward also clamps (the reference's does not): exp(15) ~ 3.3e6
        # is far past opaque for any step size, and an unclamped forward
        # overflows to inf under aggressive learning rates (observed),
        # poisoning the whole pipeline with NaNs
        return jnp.exp(jnp.clip(x, -15.0, 15.0))
    return jnp.exp(x)


@jax.custom_vjp
def truncated_exp(x: jax.Array) -> jax.Array:
    return _fwd_value(x)


def _trunc_exp_fwd(x):
    return _fwd_value(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


truncated_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
