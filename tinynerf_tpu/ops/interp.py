"""Bilinear / trilinear table lookups — the `grid_sample` equivalents.

The reference leans on torch's grid_sample for K-Planes planes
(src/models.py:108), Cobafa grids (src/models.py:232) and the occupancy grid
query (src/core.py:151), all with align_corners=True.  On TPU, gathers are the
enemy; the design here minimizes their cost:

  * tables are stored FEATURE-LAST (`[r0, r1, F]` / `[r0, r1, r2, F]`) and
    flattened so each corner fetch is ONE row gather of F contiguous floats
    (a lane-aligned vector load), not F strided scalar gathers;
  * corner indices are clamped to the table edge (coords from the scene
    contractions are already in [-1, 1]; out-of-box samples are masked
    upstream, so clamp vs zero-pad is semantically invisible).

Coordinates are in [-1, 1] with align_corners=True semantics:
coord -1 maps to index 0, coord +1 maps to index (res - 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_index_space(c, res):
    """[-1,1] -> continuous index in [0, res-1], clamped to the table."""
    x = (c + 1.0) * 0.5 * (res - 1)
    return jnp.clip(x, 0.0, res - 1)


def bilinear_lookup(table: jax.Array, coords: jax.Array) -> jax.Array:
    """table: [r0, r1, F]; coords: [..., 2] in [-1,1] -> [..., F]."""
    r0, r1, f = table.shape
    flat = table.reshape(r0 * r1, f)

    x = _to_index_space(coords[..., 0], r0)
    y = _to_index_space(coords[..., 1], r1)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r0 - 1)
    y1 = jnp.minimum(y0 + 1, r1 - 1)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]

    def fetch(ix, iy):
        return jnp.take(flat, ix * r1 + iy, axis=0)

    v00 = fetch(x0, y0)
    v01 = fetch(x0, y1)
    v10 = fetch(x1, y0)
    v11 = fetch(x1, y1)

    v0 = v00 + (v01 - v00) * ty
    v1 = v10 + (v11 - v10) * ty
    return v0 + (v1 - v0) * tx


def trilinear_lookup(table: jax.Array, coords: jax.Array) -> jax.Array:
    """table: [r0, r1, r2, F]; coords: [..., 3] in [-1,1] -> [..., F]."""
    r0, r1, r2, f = table.shape
    flat = table.reshape(r0 * r1 * r2, f)

    x = _to_index_space(coords[..., 0], r0)
    y = _to_index_space(coords[..., 1], r1)
    z = _to_index_space(coords[..., 2], r2)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r0 - 1)
    y1 = jnp.minimum(y0 + 1, r1 - 1)
    z1 = jnp.minimum(z0 + 1, r2 - 1)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    tz = (z - z0)[..., None]

    def fetch(ix, iy, iz):
        return jnp.take(flat, (ix * r1 + iy) * r2 + iz, axis=0)

    # lerp along z first, then y, then x
    v000 = fetch(x0, y0, z0)
    v001 = fetch(x0, y0, z1)
    v010 = fetch(x0, y1, z0)
    v011 = fetch(x0, y1, z1)
    v100 = fetch(x1, y0, z0)
    v101 = fetch(x1, y0, z1)
    v110 = fetch(x1, y1, z0)
    v111 = fetch(x1, y1, z1)

    v00 = v000 + (v001 - v000) * tz
    v01 = v010 + (v011 - v010) * tz
    v10 = v100 + (v101 - v100) * tz
    v11 = v110 + (v111 - v110) * tz
    v0 = v00 + (v01 - v00) * ty
    v1 = v10 + (v11 - v10) * ty
    return v0 + (v1 - v0) * tx


def sawtooth(x: jax.Array, f: float) -> jax.Array:
    """Periodic tiling encoding: 2*((f*x) mod 1) - 1, output in [-1, 1].

    (Reference SawtoothEncoding, src/models.py:209-214.)
    """
    return 2.0 * jnp.mod(f * x, 1.0) - 1.0
