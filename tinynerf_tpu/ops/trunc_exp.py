"""Truncated exponential: exp with a gradient-explosion guard.

Semantics parity with the reference's TruncatedExponential autograd Function
(reference src/models.py:42-55, itself credited to torch-ngp): the forward is
a plain exp, the backward computes g * exp(clamp(x, -15, 15)) so that one
sample with a huge pre-activation cannot blow up the whole gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def truncated_exp(x: jax.Array) -> jax.Array:
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


truncated_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
