"""Stateless per-(ray, sample) jitter hash.

The reference jitters every marched sample by U(0,1) * delta at train time
(reference src/core.py:172-173) with torch's global generator.  Here the
jitter must be addressable by (ray, sample-index) WITHOUT materializing the
full [n_rays, n_samples] grid, because the skip marcher (core/skipmarch.py)
visits a data-dependent subset of sample indices inside a lax.scan.  A
counter-based integer hash gives the same uniform any time (ray, k) is
queried, so the dense and skip marching paths produce bit-identical sample
positions — which is what makes their equivalence testable exactly.

The hash is a murmur3-style finalizer over (key, ray, k): statistically
ample for sample dithering (this is stratified jitter, not cryptography).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mix(x: jax.Array) -> jax.Array:
    """murmur3 fmix32."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_u01(key: jax.Array, ray_ids: jax.Array, sample_ids: jax.Array) -> jax.Array:
    """Uniform [0,1) per (ray, sample), stateless.

    key: a jax PRNG key (raw uint32[2]) or any uint32[2] seed material.
    ray_ids / sample_ids: broadcastable int32 arrays.
    """
    seed = jnp.asarray(key).astype(jnp.uint32).reshape(-1)
    h = (
        ray_ids.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + sample_ids.astype(jnp.uint32) * jnp.uint32(0x7FEB352D)
        + seed[0]
    )
    h = _mix(h ^ seed[-1])
    # top 24 bits -> [0, 1) exactly representable in f32
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
