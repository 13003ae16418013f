"""In-VMEM bitonic sort for packed int32 keys — the Pallas partition kernel.

WHY THIS EXISTS: K-Planes table gradients are a scatter-add of ~820k sample
contributions into ~260k table cells.  XLA's scatter is row-serialized
(~21 ns/row, measured in BASELINE.md), ~71 ms/step at the flagship budget.
The alternative — partition samples by table window, then accumulate each
window with one-hot MXU matmuls (ops/table_grad.py) — died in round 2 on the
partition cost: XLA's variadic sort is ~15 ms per 820k keys.  This kernel
removes that floor: the whole key array (4 MB at 2^20 keys) fits in VMEM, and
a bitonic network is pure vectorized compare-exchange — no serial element
ops, no HBM round trips between passes.

The sort key packs (window_id << idx_bits) | sample_index into ONE int32
(`pack_keys`), so sorting plain int32s both groups samples by window and
yields the gather permutation; within-window order is irrelevant for the
accumulation, so no stability or multi-word keys are needed.

LAYOUT: element i of the flat array lives at x[i % R, i // R] of the [R, 128]
VMEM tile (column-major, so row bits are the LOW index bits).  Bitonic
partner exchange at stride j is an XOR of bit log2(j) of i, fetched with two
circular rolls + select: a sublane roll for j < R (182 of 210 passes at
N = 2^20), a lane roll for j >= R.  The network runs as ONE lax.fori_loop
over a pass schedule with dynamic roll shifts — a fully unrolled network
with static shifts runs ~2x faster per pass but takes Mosaic ~20 min to
compile (measured), which the relay's cache-less compile path cannot
amortize.  The dominant runtime term is a ~45 us fixed cost per pass, so
independent sorts are BATCHED into one kernel by stacking them along rows
(see _sort_kernel).  N must be a power of two >= 256 — `sort_i32` pads with
INT32_MAX, which sorts to the tail.

Reference for the op this ultimately replaces: the autograd backward of
torch grid_sample in /root/reference/src/models.py:105-113.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_I32_MAX = np.int32(2**31 - 1)


def _pass_schedule(r_rows: int) -> np.ndarray:
    """[n_passes, 4] i32: (j_is_lane, j_val, k_is_lane, k_val) per
    compare-exchange pass, in network order.  j_val / k_val are the bit
    masks in their axis's index space (rows or lanes); k_val = 0 encodes the
    final globally-ascending merge ((i & k) == 0 everywhere)."""
    n = r_rows * _LANES
    rows = []
    k = 2
    while k <= n:
        if k >= n:
            k_ent = (0, 0)
        elif k < r_rows:
            k_ent = (0, k)
        else:
            k_ent = (1, k // r_rows)
        j = k // 2
        while j >= 1:
            j_ent = (0, j) if j < r_rows else (1, j // r_rows)
            rows.append((*j_ent, *k_ent))
            j //= 2
        k *= 2
    return np.asarray(rows, np.int32)


def _sort_kernel(sched_ref, x_ref, o_ref, *, r_rows):
    """One fori_loop over the pass schedule — a single compiled pass body
    (two dynamic-shift circular rolls + select/min/max), instead of the
    fully unrolled network (which took Mosaic >10 min to compile at 2^20).

    The XOR partner at single-bit stride j is roll(-j) wherever the j-bit
    of the index is 0 and roll(+j) wherever it is 1.

    BATCHING: x may hold B independent sort problems stacked along rows
    ([B * r_rows, 128]).  Single-bit XOR partners never cross a
    power-of-two block boundary (i XOR j stays in the same r_rows block for
    j < r_rows), the select masks use only LOCAL index bits (global row &
    j == local row & j since blocks are r_rows-aligned), and lane bits are
    per-block by construction — so the same pass schedule sorts every block
    independently, amortizing the per-pass fixed cost (~45 us, the
    dominant term) across the batch."""
    x0 = x_ref[:]
    total_rows = x0.shape[0]
    n_passes = sched_ref.shape[0]

    def _ids(is_lane):
        # regenerated per use (not captured) so no 4 MB iota stays live
        # across the whole loop — VMEM scoped-stack is the binding limit
        row = jax.lax.broadcasted_iota(jnp.int32, (total_rows, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (total_rows, _LANES), 1)
        return jnp.where(is_lane == 1, lane, row)

    def body(pi, x):
        j_lane = sched_ref[pi, 0]
        j_val = sched_ref[pi, 1]
        k_lane = sched_ref[pi, 2]
        k_val = sched_ref[pi, 3]

        def rolls(axis):
            size = x.shape[axis]  # roll over the FULL (stacked) axis
            down = pltpu.roll(x, j_val % size, axis=axis)
            up = pltpu.roll(x, (size - j_val) % size, axis=axis)
            return up, down

        up, down = jax.lax.cond(
            j_lane == 1,
            lambda: rolls(1),
            lambda: rolls(0),
        )
        ij = (_ids(j_lane) & j_val) != 0
        xp = jnp.where(ij, down, up)
        ik = (_ids(k_lane) & k_val) != 0
        # keep the min where (i & j) and (i & k) agree (ascending lower
        # half / descending upper half), the max otherwise
        take_min = ij == ik
        return jnp.where(take_min, jnp.minimum(x, xp), jnp.maximum(x, xp))

    o_ref[:] = jax.lax.fori_loop(0, n_passes, body, x0)


# one merged-rows kernel invocation handles at most this many key rows
# (i32 tile + roll temporaries must fit VMEM; 32k rows = 16 MB of keys)
_MAX_MERGED_ROWS = 32768


def _sort_tiles(tiles: jax.Array, interpret: bool) -> jax.Array:
    """tiles: [B, R, 128] column-major i32 -> each batch row sorted.

    The whole batch is stacked along rows into ONE kernel invocation (see
    _sort_kernel's batching note); very large batches fall back to chunks.
    """
    b, r_rows, lanes = tiles.shape
    assert lanes == _LANES
    max_b = max(1, _MAX_MERGED_ROWS // r_rows)
    if b > max_b:
        return jnp.concatenate(
            [
                _sort_tiles(tiles[i : i + max_b], interpret)
                for i in range(0, b, max_b)
            ]
        )
    sched = _pass_schedule(r_rows)
    kernel = partial(_sort_kernel, r_rows=r_rows)
    merged = tiles.reshape(b * r_rows, _LANES)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(merged.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(sched), merged)
    return out.reshape(b, r_rows, _LANES)


def sort_i32(keys: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Sort int32 keys ascending along the last axis.

    keys: [N] or [B, N], any N >= 1 (padded to the next power of two >= 256
    with INT32_MAX; the pad sorts to the tail and is sliced off).  Not
    stable.  Semantically identical to jnp.sort; the Pallas path runs the
    whole array in VMEM (N <= ~2^21 per batch row).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = keys.ndim == 1
    if squeeze:
        keys = keys[None]
    b, n = keys.shape
    n_pad = max(256, 1 << (n - 1).bit_length())
    if n_pad != n:
        keys = jnp.pad(keys, ((0, 0), (0, n_pad - n)), constant_values=_I32_MAX)
    r_rows = n_pad // _LANES
    # column-major tiling: x[r, l] = flat[l * R + r]
    tiles = jnp.swapaxes(keys.reshape(b, _LANES, r_rows), 1, 2)
    out = _sort_tiles(tiles, interpret)
    flat = jnp.swapaxes(out, 1, 2).reshape(b, n_pad)[:, :n]
    return flat[0] if squeeze else flat


def pack_keys(bucket: jax.Array, idx_bits: int) -> jax.Array:
    """(bucket << idx_bits) | iota — one sortable int32 per sample.

    Requires bucket_bits + idx_bits <= 31 (asserted by the caller via
    `packed_bits_ok`)."""
    n = bucket.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, bucket.shape, bucket.ndim - 1)
    assert n <= (1 << idx_bits)
    return (bucket.astype(jnp.int32) << idx_bits) | iota


def unpack_keys(packed: jax.Array, idx_bits: int):
    """-> (bucket, index)."""
    return packed >> idx_bits, packed & ((1 << idx_bits) - 1)


def packed_bits_ok(n_buckets: int, n_samples: int) -> bool:
    bucket_bits = max(1, int(np.ceil(np.log2(max(n_buckets, 2)))))
    idx_bits = max(1, int(np.ceil(np.log2(max(n_samples, 2)))))
    return bucket_bits + idx_bits <= 31
