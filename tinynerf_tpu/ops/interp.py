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

from functools import partial

import jax
import jax.numpy as jnp


def _to_index_space(c, res):
    """[-1,1] -> continuous index in [0, res-1], clamped to the table."""
    x = (c + 1.0) * 0.5 * (res - 1)
    return jnp.clip(x, 0.0, res - 1)


def _corners_2d(coords, r0, r1):
    """Corner flat indices + lerp weights for bilinear interpolation.

    Returns (idx [...,4] int32, w [...,4] f32) over corners
    (00, 01, 10, 11)."""
    x = _to_index_space(coords[..., 0], r0)
    y = _to_index_space(coords[..., 1], r1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r0 - 1)
    y1 = jnp.minimum(y0 + 1, r1 - 1)
    tx = x - x0
    ty = y - y0
    idx = jnp.stack(
        [x0 * r1 + y0, x0 * r1 + y1, x1 * r1 + y0, x1 * r1 + y1], axis=-1
    )
    w = jnp.stack(
        [(1 - tx) * (1 - ty), (1 - tx) * ty, tx * (1 - ty), tx * ty], axis=-1
    )
    return idx, w


def _corners_3d(coords, r0, r1, r2):
    """Corner flat indices + lerp weights for trilinear interpolation ([...,8])."""
    x = _to_index_space(coords[..., 0], r0)
    y = _to_index_space(coords[..., 1], r1)
    z = _to_index_space(coords[..., 2], r2)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r0 - 1)
    y1 = jnp.minimum(y0 + 1, r1 - 1)
    z1 = jnp.minimum(z0 + 1, r2 - 1)
    tx, ty, tz = x - x0, y - y0, z - z0

    def flat(a, b, c):
        return (a * r1 + b) * r2 + c

    idx = jnp.stack(
        [
            flat(x0, y0, z0), flat(x0, y0, z1), flat(x0, y1, z0), flat(x0, y1, z1),
            flat(x1, y0, z0), flat(x1, y0, z1), flat(x1, y1, z0), flat(x1, y1, z1),
        ],
        axis=-1,
    )
    wx0, wx1 = 1 - tx, tx
    wy0, wy1 = 1 - ty, ty
    wz0, wz1 = 1 - tz, tz
    w = jnp.stack(
        [
            wx0 * wy0 * wz0, wx0 * wy0 * wz1, wx0 * wy1 * wz0, wx0 * wy1 * wz1,
            wx1 * wy0 * wz0, wx1 * wy0 * wz1, wx1 * wy1 * wz0, wx1 * wy1 * wz1,
        ],
        axis=-1,
    )
    return idx, w


def _weighted_gather(flat_table, idx, w, gather_dtype=None):
    """Gather corner rows and reduce with lerp weights.

    flat_table [M, F], idx [..., C], w [..., C] -> [..., F] float32.
    `gather_dtype` optionally down-casts the table before the gather — the
    gather is byte-rate-limited on TPU, so bf16 tables double its throughput.
    """
    t = flat_table if gather_dtype is None else flat_table.astype(gather_dtype)
    vals = jnp.take(t, idx, axis=0).astype(jnp.float32)  # [..., C, F]
    return jnp.sum(vals * w[..., None], axis=-2)


def bilinear_lookup(table: jax.Array, coords: jax.Array) -> jax.Array:
    """table: [r0, r1, F]; coords: [..., 2] in [-1,1] -> [..., F].
    Plain autodiff version (f32 gathers, exact scatter-add backward)."""
    r0, r1, f = table.shape
    idx, w = _corners_2d(coords, r0, r1)
    return _weighted_gather(table.reshape(r0 * r1, f), idx, w)


def trilinear_lookup(table: jax.Array, coords: jax.Array) -> jax.Array:
    """table: [r0, r1, r2, F]; coords: [..., 3] in [-1,1] -> [..., F]."""
    r0, r1, r2, f = table.shape
    idx, w = _corners_3d(coords, r0, r1, r2)
    return _weighted_gather(table.reshape(r0 * r1 * r2, f), idx, w)


# --------------------------------------------------------------------------
# Mixed-precision lookups: bf16 forward gathers (2x gather throughput — the
# TPU gather path is byte-rate-limited) with an exact f32 scatter-add
# backward via custom VJP.  NOTE: the coordinate cotangent is ZERO — valid
# here because sample coordinates come from (no-grad) ray marching; do not
# use these where gradients must flow into coords.
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_lookup_mixed(
    table, coords, gather_dtype=jnp.bfloat16, scatter_dtype=jnp.float32
):
    r0, r1, f = table.shape
    idx, w = _corners_2d(coords, r0, r1)
    return _weighted_gather(table.reshape(r0 * r1, f), idx, w, gather_dtype)


def _bilinear_mixed_fwd(table, coords, gather_dtype, scatter_dtype):
    return (
        bilinear_lookup_mixed(table, coords, gather_dtype, scatter_dtype),
        (table, coords),
    )


def _bilinear_mixed_bwd(gather_dtype, scatter_dtype, res, g):
    table, coords = res
    r0, r1, f = table.shape
    idx, w = _corners_2d(coords, r0, r1)
    contrib = (g[..., None, :] * w[..., :, None]).reshape(-1, f)
    grad_flat = (
        jnp.zeros((r0 * r1, f), scatter_dtype)
        .at[idx.reshape(-1)]
        .add(contrib.astype(scatter_dtype))
    )
    return grad_flat.reshape(r0, r1, f).astype(jnp.float32), jnp.zeros_like(coords)


bilinear_lookup_mixed.defvjp(_bilinear_mixed_fwd, _bilinear_mixed_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def trilinear_lookup_mixed(
    table, coords, gather_dtype=jnp.bfloat16, scatter_dtype=jnp.float32
):
    r0, r1, r2, f = table.shape
    idx, w = _corners_3d(coords, r0, r1, r2)
    return _weighted_gather(table.reshape(r0 * r1 * r2, f), idx, w, gather_dtype)


def _trilinear_mixed_fwd(table, coords, gather_dtype, scatter_dtype):
    return (
        trilinear_lookup_mixed(table, coords, gather_dtype, scatter_dtype),
        (table, coords),
    )


def _trilinear_mixed_bwd(gather_dtype, scatter_dtype, res, g):
    table, coords = res
    r0, r1, r2, f = table.shape
    idx, w = _corners_3d(coords, r0, r1, r2)
    contrib = (g[..., None, :] * w[..., :, None]).reshape(-1, f)
    grad_flat = (
        jnp.zeros((r0 * r1 * r2, f), scatter_dtype)
        .at[idx.reshape(-1)]
        .add(contrib.astype(scatter_dtype))
    )
    return grad_flat.reshape(r0, r1, r2, f).astype(jnp.float32), jnp.zeros_like(coords)


trilinear_lookup_mixed.defvjp(_trilinear_mixed_fwd, _trilinear_mixed_bwd)


# --------------------------------------------------------------------------
# Cell-packed lookups: ALL interpolation corners of a cell live in ONE table
# row ([4F] for bilinear, [8F] for trilinear), so each sample costs exactly
# one gather row forward and one scatter row backward.  TPU scatters are
# ROW-COUNT-limited (measured ~15-40 ns/row regardless of width, and
# windowed scatters are ~70x slower than canonical row scatters), so packing
# 4 corners into one 512-byte row cuts the dominant backward cost ~4x.  The
# packed table is rebuilt from the parameter table every call — a dense copy
# that costs ~1 ms/step total, noise next to the scatters it saves.
#
# Index convention: cell origin clamped to [0, res-2]; fractional offsets in
# [0, 1] (at coord == +1 the last cell interpolates with t == 1, which is
# exactly the edge value — identical results to the corner-clamped form).
# Coordinate cotangents are ZERO (see note above).
# --------------------------------------------------------------------------


def _cell_2d(coords, r0, r1):
    x = _to_index_space(coords[..., 0], r0)
    y = _to_index_space(coords[..., 1], r1)
    x0 = jnp.clip(jnp.floor(x), 0, r0 - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, r1 - 2).astype(jnp.int32)
    tx = x - x0
    ty = y - y0
    cell = x0 * (r1 - 1) + y0
    w = jnp.stack(
        [(1 - tx) * (1 - ty), (1 - tx) * ty, tx * (1 - ty), tx * ty], axis=-1
    )
    return cell, w


def _build_quad(table, gather_dtype):
    """[r0, r1, F] -> [(r0-1)*(r1-1), 4F]; corner order (00, 01, 10, 11)."""
    t = table.astype(gather_dtype)
    q = jnp.stack(
        [t[:-1, :-1], t[:-1, 1:], t[1:, :-1], t[1:, 1:]], axis=2
    )  # [r0-1, r1-1, 4, F]
    r0, r1, f = table.shape
    return q.reshape((r0 - 1) * (r1 - 1), 4 * f)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_lookup_quad(table, coords, gather_dtype=jnp.bfloat16):
    """Bilinear lookup with the cell-packed (one row per sample) layout."""
    r0, r1, f = table.shape
    quad = _build_quad(table, gather_dtype)
    cell, w = _cell_2d(coords, r0, r1)
    rows = jnp.take(quad, cell, axis=0).astype(jnp.float32)
    vals = rows.reshape(*cell.shape, 4, f)
    return jnp.sum(vals * w[..., None], axis=-2)


def _bilinear_quad_fwd(table, coords, gather_dtype):
    return bilinear_lookup_quad(table, coords, gather_dtype), (table, coords)


def _bilinear_quad_bwd(gather_dtype, res, g):
    table, coords = res
    r0, r1, f = table.shape
    cell, w = _cell_2d(coords, r0, r1)
    contrib = (g[..., None, :] * w[..., :, None]).reshape(-1, 4 * f)
    gq = (
        jnp.zeros(((r0 - 1) * (r1 - 1), 4 * f), jnp.float32)
        .at[cell.reshape(-1)]
        .add(contrib)
    ).reshape(r0 - 1, r1 - 1, 4, f)
    grad = jnp.zeros((r0, r1, f), jnp.float32)
    grad = grad.at[:-1, :-1].add(gq[:, :, 0])
    grad = grad.at[:-1, 1:].add(gq[:, :, 1])
    grad = grad.at[1:, :-1].add(gq[:, :, 2])
    grad = grad.at[1:, 1:].add(gq[:, :, 3])
    return grad, jnp.zeros_like(coords)


bilinear_lookup_quad.defvjp(_bilinear_quad_fwd, _bilinear_quad_bwd)


def _cell_3d(coords, r0, r1, r2):
    x = _to_index_space(coords[..., 0], r0)
    y = _to_index_space(coords[..., 1], r1)
    z = _to_index_space(coords[..., 2], r2)
    x0 = jnp.clip(jnp.floor(x), 0, r0 - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, r1 - 2).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(z), 0, r2 - 2).astype(jnp.int32)
    tx, ty, tz = x - x0, y - y0, z - z0
    cell = (x0 * (r1 - 1) + y0) * (r2 - 1) + z0
    wx0, wx1 = 1 - tx, tx
    wy0, wy1 = 1 - ty, ty
    wz0, wz1 = 1 - tz, tz
    w = jnp.stack(
        [
            wx0 * wy0 * wz0, wx0 * wy0 * wz1, wx0 * wy1 * wz0, wx0 * wy1 * wz1,
            wx1 * wy0 * wz0, wx1 * wy0 * wz1, wx1 * wy1 * wz0, wx1 * wy1 * wz1,
        ],
        axis=-1,
    )
    return cell, w


def _build_oct(table, gather_dtype):
    """[r0, r1, r2, F] -> [(r0-1)(r1-1)(r2-1), 8F]; corner order matches
    _corners_3d (z fastest, then y, then x)."""
    t = table.astype(gather_dtype)
    q = jnp.stack(
        [
            t[:-1, :-1, :-1], t[:-1, :-1, 1:], t[:-1, 1:, :-1], t[:-1, 1:, 1:],
            t[1:, :-1, :-1], t[1:, :-1, 1:], t[1:, 1:, :-1], t[1:, 1:, 1:],
        ],
        axis=3,
    )  # [r0-1, r1-1, r2-1, 8, F]
    r0, r1, r2, f = table.shape
    return q.reshape((r0 - 1) * (r1 - 1) * (r2 - 1), 8 * f)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def trilinear_lookup_oct(table, coords, gather_dtype=jnp.bfloat16):
    """Trilinear lookup with the cell-packed (one row per sample) layout."""
    r0, r1, r2, f = table.shape
    oct_t = _build_oct(table, gather_dtype)
    cell, w = _cell_3d(coords, r0, r1, r2)
    rows = jnp.take(oct_t, cell, axis=0).astype(jnp.float32)
    vals = rows.reshape(*cell.shape, 8, f)
    return jnp.sum(vals * w[..., None], axis=-2)


def _trilinear_oct_fwd(table, coords, gather_dtype):
    return trilinear_lookup_oct(table, coords, gather_dtype), (table, coords)


def _trilinear_oct_bwd(gather_dtype, res, g):
    table, coords = res
    r0, r1, r2, f = table.shape
    cell, w = _cell_3d(coords, r0, r1, r2)
    contrib = (g[..., None, :] * w[..., :, None]).reshape(-1, 8 * f)
    gq = (
        jnp.zeros(((r0 - 1) * (r1 - 1) * (r2 - 1), 8 * f), jnp.float32)
        .at[cell.reshape(-1)]
        .add(contrib)
    ).reshape(r0 - 1, r1 - 1, r2 - 1, 8, f)
    grad = jnp.zeros((r0, r1, r2, f), jnp.float32)
    grad = grad.at[:-1, :-1, :-1].add(gq[..., 0, :])
    grad = grad.at[:-1, :-1, 1:].add(gq[..., 1, :])
    grad = grad.at[:-1, 1:, :-1].add(gq[..., 2, :])
    grad = grad.at[:-1, 1:, 1:].add(gq[..., 3, :])
    grad = grad.at[1:, :-1, :-1].add(gq[..., 4, :])
    grad = grad.at[1:, :-1, 1:].add(gq[..., 5, :])
    grad = grad.at[1:, 1:, :-1].add(gq[..., 6, :])
    grad = grad.at[1:, 1:, 1:].add(gq[..., 7, :])
    return grad, jnp.zeros_like(coords)


trilinear_lookup_oct.defvjp(_trilinear_oct_fwd, _trilinear_oct_bwd)


# --------------------------------------------------------------------------
# Exact 2x upsampling for nested align_corners grids.  A bilinear interpolant
# on an (r, r) table is reproduced EXACTLY by bilinear interpolation of its
# samples on a (2r-1, 2r-1) grid (the fine grid's nodes are the coarse nodes
# plus edge/cell midpoints, and a bilinear function is determined by any
# cell's corners).  This is what lets multiple K-Planes scales share ONE
# gather row forward and ONE scatter row backward (models/kplanes.py "fused"
# mode): TPU scatters are ROW-count-limited, so fusing 3 scales per
# projection cuts the dominant backward cost ~2x.
# --------------------------------------------------------------------------


def _upsample2x_axis0(x: jax.Array) -> jax.Array:
    """[r, ...] -> [2r-1, ...]: nodes kept, midpoints averaged in."""
    mid = 0.5 * (x[:-1] + x[1:])
    inter = jnp.stack([x[:-1], mid], axis=1).reshape(
        2 * (x.shape[0] - 1), *x.shape[1:]
    )
    return jnp.concatenate([inter, x[-1:]], axis=0)


def upsample2x_exact(table: jax.Array) -> jax.Array:
    """[r0, r1, F] -> [2*r0-1, 2*r1-1, F], exact for bilinear interpolation."""
    t = _upsample2x_axis0(table)
    return jnp.swapaxes(_upsample2x_axis0(jnp.swapaxes(t, 0, 1)), 0, 1)


def upsample_to(table: jax.Array, r0: int, r1: int) -> jax.Array:
    """Repeated exact 2x upsampling up to (r0, r1); requires a power-of-two
    nesting chain ((target-1) = 2^k * (source-1))."""
    while table.shape[0] < r0 or table.shape[1] < r1:
        table = upsample2x_exact(table)
    assert table.shape[:2] == (r0, r1), (
        f"resolutions do not nest: got {table.shape[:2]}, want {(r0, r1)}"
    )
    return table


# --------------------------------------------------------------------------
# Multiscale lookup: one custom VJP over ALL scales of a projection.
#
# Forward: per-scale cell-packed lookups (narrow rows — gathers are
# byte-limited, so fusing scales buys nothing forward).
# Backward: gradients are computed AS IF the forward had used the exactly-
# upsampled fused fine table (valid because the two representations are the
# same function): one scatter of [4 * n_scales * F]-wide rows per sample into
# the fused quad-gradient — TPU scatters are ROW-count-limited, so one wide
# scatter replaces n_scales narrow ones — then the fine gradient is pulled
# back through the (linear) upsampling transpose to each master table.
# Coordinate cotangents are ZERO (sample coords come from no-grad marching).
# --------------------------------------------------------------------------


def _quad_lookup_fwd_value(table, coords, gather_dtype):
    r0, r1, f = table.shape
    quad = _build_quad(table, gather_dtype)
    cell, w = _cell_2d(coords, r0, r1)
    rows = jnp.take(quad, cell, axis=0).astype(jnp.float32)
    vals = rows.reshape(*cell.shape, 4, f)
    return jnp.sum(vals * w[..., None], axis=-2)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_lookup_multiscale(tables, coords, gather_dtype=jnp.bfloat16):
    """tables: tuple of [r_s, r_s, F] planes whose (r-1) nest by powers of
    two; coords [..., 2] in [-1,1].  Returns the feature-wise concat of the
    per-scale bilinear lookups, [..., n_scales * F]."""
    return jnp.concatenate(
        [_quad_lookup_fwd_value(t, coords, gather_dtype) for t in tables],
        axis=-1,
    )


def _multiscale_fwd(tables, coords, gather_dtype):
    return bilinear_lookup_multiscale(tables, coords, gather_dtype), (
        tables,
        coords,
    )


def _multiscale_bwd(gather_dtype, res, g):
    tables, coords = res
    r_fine = max(t.shape[0] for t in tables)
    f_tot = sum(t.shape[-1] for t in tables)
    cell, w = _cell_2d(coords, r_fine, r_fine)
    # corner-major rows [c0(f_tot), c1, c2, c3]
    contrib = (w[..., :, None] * g[..., None, :]).reshape(-1, 4 * f_tot)
    n_cells = (r_fine - 1) * (r_fine - 1)
    gq = (
        jnp.zeros((n_cells, 4 * f_tot), jnp.float32)
        .at[cell.reshape(-1)]
        .add(contrib)
    ).reshape(r_fine - 1, r_fine - 1, 4, f_tot)
    fine = jnp.zeros((r_fine, r_fine, f_tot), jnp.float32)
    fine = fine.at[:-1, :-1].add(gq[:, :, 0])
    fine = fine.at[:-1, 1:].add(gq[:, :, 1])
    fine = fine.at[1:, :-1].add(gq[:, :, 2])
    fine = fine.at[1:, 1:].add(gq[:, :, 3])
    grads = []
    off = 0
    for t in tables:
        sl = fine[..., off : off + t.shape[-1]]
        off += t.shape[-1]
        if t.shape[0] == r_fine:
            grads.append(sl)
        else:
            _, pullback = jax.vjp(
                lambda tt: upsample_to(tt, r_fine, r_fine), jnp.zeros_like(t)
            )
            grads.append(pullback(sl)[0])
    return tuple(grads), jnp.zeros_like(coords)


bilinear_lookup_multiscale.defvjp(_multiscale_fwd, _multiscale_bwd)


def sawtooth(x: jax.Array, f: float) -> jax.Array:
    """Periodic tiling encoding: 2*((f*x) mod 1) - 1, output in [-1, 1].

    (Reference SawtoothEncoding, src/models.py:209-214.)
    """
    return 2.0 * jnp.mod(f * x, 1.0) - 1.0
