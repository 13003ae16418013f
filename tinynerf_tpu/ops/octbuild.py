"""Pallas cell-pack (oct/quad) table builders — the relayout hot path.

The cell-packed lookup layouts (ops/interp.py `_build_oct` / `_build_quad`;
the TPU redesign of the reference's grid_sample lookups, reference
src/models.py:105-113 and 232) pay ONE row gather per sample by storing all
2^D corners of a cell contiguously: [prod(r_i - 1), 2^D * F].  The build is
a pure relayout, but every XLA formulation measured (stack+reshape, interior
-pad dilation, staged concat, one-hot conv) runs 10-20x above the HBM
bandwidth floor (~21 ms for a 128^3x4ch grid vs ~1 ms; BASELINE.md round 3)
because the interleave materializes intermediates with a C-wide (4-of-128
lanes) minor dimension.

Round-4 OUTCOME (tools/bench_octbuild.py, v5e): the premise was stale.  On
today's toolchain the XLA interior-pad build runs at ~7.7 ms/128^3 (the
round-3 record said ~21), and these kernels TIE it — vector formulations
are lane-starved (6.6 GB/s measured at C=4), and the MXU dilation form
below reaches parity (roster 30.6 vs 33.6 ms standalone; lookup fwd+bwd
28.0 vs 27.7 ms in context) but not past it, because the final
[X, m2*8C] -> [M, 8C] lane-split reshape (~5 ms) and the M-starved matmul
tails give back what the dilation saves.  Kept in-tree as tested opt-in
(`interp._OCT_BUILD_PALLAS`) and as the measured record of this design
space; the XLA form stays the default.

Numeric contract: bit-identical to the jnp reference (`*_ref` below, the
shipping interior-pad formulation) including the dtype cast; tested in
tests/test_octbuild.py, TPU-vs-reference equality in the same file.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# corner order: last axis fastest — must match ops/interp.py `_cell_3d` /
# `_cell_2d` weight order
CORNERS_3D = tuple((dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))
CORNERS_2D = tuple((dx, dy) for dx in (0, 1) for dy in (0, 1))


# ------------------------------------------------------------------ reference


def build_oct_ref(table: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """[r0, r1, r2, F] -> [(r0-1)(r1-1)(r2-1), 8F] (semantic reference)."""
    t = table.astype(out_dtype)
    r0, r1, r2, f = table.shape
    parts = [
        t[dx : dx + r0 - 1, dy : dy + r1 - 1, dz : dz + r2 - 1, :]
        for (dx, dy, dz) in CORNERS_3D
    ]
    q = jnp.stack(parts, axis=-2)  # [r0-1, r1-1, r2-1, 8, F]
    return q.reshape((r0 - 1) * (r1 - 1) * (r2 - 1), 8 * f)


def build_quad_ref(table: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """[r0, r1, F] -> [(r0-1)(r1-1), 4F] (semantic reference)."""
    t = table.astype(out_dtype)
    r0, r1, f = table.shape
    parts = [
        t[dx : dx + r0 - 1, dy : dy + r1 - 1, :] for (dx, dy) in CORNERS_2D
    ]
    q = jnp.stack(parts, axis=-2)
    return q.reshape((r0 - 1) * (r1 - 1), 4 * f)


# -------------------------------------------------------------------- kernels


def _oct_kernel_mxu(a_ref, b_ref, p_ref, o_ref, *, feat: int, chunk: int):
    """MXU lane-dilation oct build.

    Vector-op formulations are lane-starved: every [.., C]-shaped value
    (C = 4-8 channels) pads C -> 128 lanes, so rolls/concats/stores run at
    ~3% occupancy (measured 6.6 GB/s — barely above the XLA form).  But the
    z-lane interleave is a fixed one-hot LINEAR map, so each (dx, dy)
    corner pair is ONE matmul against a shared pattern P3[s, k, m] =
    (m < 2C) and (s == C*k + m)  (the dz in {0,1} corners collapse into the
    2C window), followed by a lane roll of (4dx+2dy)*C placing the block.
    One-hot bf16 products accumulate exactly in the MXU's f32 tree, so the
    result is bit-identical to slicing.  ~270 GFLOP for a 128^3x4 grid
    ~= MXU-bound instead of relayout-bound.
    """
    c = feat
    jj = pl.program_id(1)
    p = p_ref[...]  # [r2*C, m2*8C] one-hot (2-D: Mosaic cannot flatten 3-D)
    acc = None
    for dx in (0, 1):
        ref = b_ref if dx else a_ref
        # dynamic sublane starts must be 8-aligned (Mosaic "cannot statically
        # prove ... multiple of 8"): read an aligned J+8 window once, take
        # the dy in {0,1} shift as a static in-register slice
        win = ref[0, pl.ds(pl.multiple_of(jj * chunk, 8), chunk + 8), :]
        for dy in (0, 1):
            s = win[dy : dy + chunk]  # [J, r2*C]
            m2d = jax.lax.dot_general(
                s,
                p,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [J, m2*8C]
            off = (4 * dx + 2 * dy) * c
            if off:
                # place this corner pair's 2C block at lane offset off within
                # each 8C cell group (wrapped lanes carry only zeros)
                m2d = pltpu.roll(m2d, shift=off, axis=1)
            acc = m2d if acc is None else acc + m2d
    o_ref[0] = acc.astype(o_ref.dtype)


def _quad_kernel(a_ref, b_ref, o_ref):
    # four separate lane-offset stores, NOT a concat: Mosaic's sublane roll
    # is lazy (keeps an offset layout), and its concatenate rejects inputs
    # at different sublane offsets; stores relayout per part instead.  F is
    # >= 32 lanes here, so per-part stores keep healthy lane occupancy
    # (unlike the C=4-8 oct case, which needs the MXU kernel above).
    a = a_ref[0]  # row i:   [r1, F]
    b = b_ref[0]  # row i+1: [r1, F]
    m1 = a.shape[0] - 1
    f = a.shape[1]
    for d, (dx, dy) in enumerate(CORNERS_2D):
        s = b if dx else a
        o_ref[0, :, d * f : (d + 1) * f] = s[dy : dy + m1, :].astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "interpret", "chunk"))
def build_oct_pallas(
    table: jax.Array, out_dtype=jnp.bfloat16, interpret=False, chunk: int = 128
):
    # chunk: y rows per program = the matmul M dim.  Small chunks starve the
    # MXU (J=8 measured 6% utilization -> 12 ms for 128^3; J~128 fills it).
    r0, r1, r2, f = table.shape
    m1, m2 = r1 - 1, r2 - 1
    j = min(chunk, m1)
    if j < m1:
        # multi-chunk starts are asserted 8-aligned in the kernel
        j = max(8, (j // 8) * 8)
    k = r2 * f

    # matmul dtype: one-hot products are exact in bf16 for any value that is
    # itself bf16/fp8 (cast to out_dtype FIRST = the reference cast, then
    # widen losslessly); only an f32 build needs an f32 matmul
    out_dt = jnp.dtype(out_dtype)
    mm_dtype = jnp.float32 if out_dt == jnp.float32 else jnp.bfloat16
    src = table.astype(out_dtype).astype(mm_dtype).reshape(r0, r1, k)
    # pad y so even the last (partial, masked) chunk's aligned J+8 window
    # stays in bounds — an out-of-range pl.ds start CLAMPS, which would
    # silently shift rows
    n_chunks = -(-m1 // j)
    rows_needed = n_chunks * j + 8
    src = jnp.pad(src, ((0, 0), (0, rows_needed - r1), (0, 0)))

    # P2[s, t] = 1 iff t%(8C) < 2C and s == C*(t//(8C)) + t%(8C): the dz-pair
    # (dz in {0,1}) one-hot window, 2-D because Mosaic cannot flatten a 3-D
    # matmul operand
    n_lanes = m2 * 8 * f
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (k, n_lanes), 0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (k, n_lanes), 1)
    t_mod = t_ids % (8 * f)
    p2 = ((t_mod < 2 * f) & (s_ids == f * (t_ids // (8 * f)) + t_mod)).astype(
        mm_dtype
    )

    out = pl.pallas_call(
        partial(_oct_kernel_mxu, feat=f, chunk=j),
        grid=(r0 - 1, pl.cdiv(m1, j)),
        in_specs=[
            pl.BlockSpec(
                (1, rows_needed, k),
                lambda i, jj: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows_needed, k),
                lambda i, jj: (i + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, n_lanes), lambda i, jj: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, j, n_lanes), lambda i, jj: (i, jj, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r0 - 1, m1, n_lanes), out_dtype),
        interpret=interpret,
    )(src, src, p2)
    # the [.., m2*8C] -> [M, 8C] lane split is one XLA reshape (timed in
    # tools/bench_octbuild.py; it is NOT free, but the healthy-lane source
    # keeps it far from the C-minor relayout disease)
    return out.reshape((r0 - 1) * m1 * m2, 8 * f)


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def build_quad_pallas(table: jax.Array, out_dtype=jnp.bfloat16, interpret=False):
    r0, r1, f = table.shape
    out = pl.pallas_call(
        _quad_kernel,
        grid=(r0 - 1,),
        in_specs=[
            pl.BlockSpec((1, r1, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, r1, f), lambda i: (i + 1, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, r1 - 1, 4 * f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r0 - 1, r1 - 1, 4 * f), out_dtype),
        interpret=interpret,
    )(table, table)
    return out.reshape((r0 - 1) * (r1 - 1), 4 * f)
