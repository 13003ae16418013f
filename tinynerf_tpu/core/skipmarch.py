"""Empty-space-skipping ray marching (TPU-native occupancy culling).

The reference culls empty space by evaluating the occupancy grid at every
marched sample (src/core.py:176): n_rays x n_samples point queries.  On TPU
those queries are scalar gathers at ~9 ns/element — ~100 ms/step at the
flagship budget, the single largest cost of the sampling path.

This module replaces brute-force querying with the Instant-NGP-style skip
idea, recast for XLA: a SKIP GRID precomputed from the occupancy grid stores,
per voxel, how many whole samples a ray may safely advance (0 = occupied).
Marching becomes a fixed-length `lax.scan`, vectorized over rays, that per
step gathers ONE skip value per ray and either emits the sample (occupied
voxel) or jumps over the guaranteed-empty region.  At converged occupancy a
ray needs ~(surviving samples + a few skip hops) steps instead of n_samples,
cutting gathers ~4x at the flagship config.

EXACTNESS: the emitted sample set equals the brute-force path's surviving
set exactly — including jitter — because (a) skip distances are conservative
by one voxel, which absorbs the <= one-voxel jitter displacement, and (b)
both paths draw the per-(ray, sample) jitter from the same stateless hash
(ops/hashrng.py).  Tests assert set equality against the dense reference.

Rays still marching after `n_steps` scan steps are flagged incomplete so the
loss can exclude them (the same mechanism as sample-cap overflow).  The
training loop only selects this path when the demand estimate leaves ample
step budget; early training (everything occupied) uses the dense path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashrng import hash_u01
from .contraction import ContractionAABB


def _maxpool_shift(x: jax.Array, radius: int) -> jax.Array:
    """Max over shifts {-radius, 0, +radius} along every axis (zero fill).

    Applied to an occupancy map that is already a radius-r max-pool, this
    yields the radius-2r max-pool (shift composition: |a| in {0, r} plus the
    input's own radius-r coverage spans every offset up to 2r)."""
    out = x
    for axis in range(x.ndim):
        n = x.shape[axis]
        r = min(radius, n)
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(x, r, n, axis=axis),
             jnp.zeros_like(jax.lax.slice_in_dim(x, 0, r, axis=axis))],
            axis=axis,
        )
        hi = jnp.concatenate(
            [jnp.zeros_like(jax.lax.slice_in_dim(x, n - r, n, axis=axis)),
             jax.lax.slice_in_dim(x, 0, n - r, axis=axis)],
            axis=axis,
        )
        out = jnp.maximum(out, jnp.maximum(lo, hi))
        x = out
    return out


def skip_advances(voxel_w_min: float, step_size: float, n_levels: int) -> Tuple[int, ...]:
    """Safe sample-advance per pool level.

    Level j certifies every voxel within Chebyshev radius r = 2^j of the
    current sample's voxel is empty.  A jittered sample k+i (i < m, all
    SKIPPED, the visited k+m is queried) lies within m*step of the current
    jittered sample, i.e. within floor(m*step/w)+1 voxels, so skipping is
    safe while m*step < r*w: m = ceil(r*w/step) - 1.
    """
    return tuple(
        max(1, int(np.ceil((1 << j) * voxel_w_min / step_size)) - 1)
        for j in range(n_levels)
    )


def make_skip_grid(
    occ_bool: jax.Array,  # [r0, r1, r2] bool, thresholded occupancy
    advances: Tuple[int, ...],  # from skip_advances (static)
) -> jax.Array:
    """int32 grid: 0 = occupied voxel (emit), else safe sample advance."""
    occ = occ_bool.astype(jnp.float32)
    adv = jnp.where(occ_bool, jnp.int32(0), jnp.int32(1))
    pooled = _maxpool_shift(occ, 1)  # radius 1 (3^3 window)
    radius = 1
    for a_j in advances:
        adv = jnp.where(~occ_bool & (pooled == 0.0), jnp.int32(a_j), adv)
        radius_next = radius * 2
        pooled = _maxpool_shift(pooled, radius)  # radius doubles
        radius = radius_next
    return adv


def skip_march(
    rays_o: jax.Array,  # [R, 3]
    rays_d: jax.Array,  # [R, 3]
    t_min: jax.Array,  # [R] box entry (clamped to near, as the marcher does)
    t_exit: jax.Array,  # [R] box exit
    step_size: float,
    n_samples: int,
    contraction: ContractionAABB,
    skip_grid: jax.Array,  # [r0, r1, r2] int32 from make_skip_grid
    key: Optional[jax.Array],
    n_steps: int,
) -> Tuple[jax.Array, jax.Array]:
    """March with empty-space skipping.

    Returns (k_idx [R, n_steps] int32 emitted sample indices (-1 = none,
    ascending per ray), complete [R] bool — False where the step budget ran
    out before the ray finished; such rays must be excluded from the loss).
    """
    R = rays_o.shape[0]
    r0, r1, r2 = skip_grid.shape
    res = jnp.array([r0 - 1, r1 - 1, r2 - 1], jnp.float32)  # align_corners
    flat_grid = skip_grid.reshape(-1)
    ray_ids = jnp.arange(R, dtype=jnp.int32)
    delta = jnp.float32(step_size)

    # number of in-box samples: sample k is in the box iff t_k <= t_exit
    # (t >= t_min = entry by construction; out-of-box tails are never
    # emitted by the dense path either — its contraction mask culls them).
    # +2 margin: emission uses the contraction's coordinate mask, which can
    # disagree with the slab t_exit by 1 ulp at the boundary sample
    k_end = jnp.clip(
        jnp.floor((t_exit - t_min) / delta) + 2.0, 0.0, float(n_samples)
    ).astype(jnp.int32)

    def one_round(k, done):
        kk = jnp.minimum(k, n_samples - 1)
        if key is not None:
            u = hash_u01(key, ray_ids, kk)
        else:
            u = jnp.float32(0.0)
        t = t_min + (kk.astype(jnp.float32) + u) * delta
        pos = rays_o + rays_d * t[:, None]
        # the contraction's own in-box mask makes emission bit-identical to
        # the dense path (a t <= t_exit test disagrees by 1 ulp at box edges)
        cpos, inbox = contraction(pos)
        idx = jnp.clip(
            jnp.round((cpos + 1.0) * 0.5 * res), 0.0, res
        ).astype(jnp.int32)
        vox = (idx[:, 0] * r1 + idx[:, 1]) * r2 + idx[:, 2]
        g = flat_grid[vox]  # ONE gather per ray per round

        active = ~done & (k < k_end)
        emit = active & (g == 0) & (inbox > 0.0)
        adv = jnp.maximum(g, 1)
        k_next = jnp.where(active, k + adv, k)
        done_next = done | (k_next >= k_end)
        y = jnp.where(emit, kk, jnp.int32(-1))
        return k_next, done_next, y

    # 2 rounds per scan iteration: halves loop-carry overhead without
    # changing the visit sequence (outputs stay per-round)
    unroll = 2 if n_steps % 2 == 0 else 1

    def body(carry, _):
        k, done = carry
        ys = []
        for _ in range(unroll):
            k, done, y = one_round(k, done)
            ys.append(y)
        return (k, done), jnp.stack(ys)  # [unroll, R]

    init = (jnp.zeros(R, jnp.int32), jnp.zeros(R, bool))
    (k_fin, done_fin), ys = jax.lax.scan(
        body, init, None, length=n_steps // unroll
    )
    # [n_iters, unroll, R] -> [R, n_steps], round order preserved per ray
    k_idx = ys.reshape(n_steps, R).T
    return k_idx, done_fin
