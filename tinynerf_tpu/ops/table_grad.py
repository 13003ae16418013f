"""Sorted-window table-gradient accumulation — the MXU scatter replacement.

The backward of a cell-packed bilinear/trilinear lookup is a scatter-add of
per-sample contribution rows contrib[i] = concat_c(w[i, c] * g[i, :]) into
corner-packed gradient rows cell[i] of a [n_cells, n_corners * F] table.
XLA lowers that to a row-serialized scatter (~21 ns/row + ~6 ms fixed per
call — ~71 ms/step at the flagship budget, BASELINE.md).  Here the samples
are first grouped by table WINDOW (W consecutive cells) with the in-VMEM
bitonic partition (ops/bitonic.py), and each window is then accumulated with
one-hot MXU matmuls:

    T_w[W, nc*F] += onehot[C, W]^T @ contrib_chunk[C, nc*F]

streamed chunk-by-chunk from HBM with explicit DMA.  Everything is
vectorized: no per-row serialization anywhere in the pipeline.

Data layout: ONE packed row per sample, so the whole sorted stream costs ONE
permutation gather (row gathers are latency-floored at ~6 ns/row on narrow
rows, so three separate gathers for g/w/cell would pay the floor three
times) and one DMA stream in the kernel.  Two payload encodings:

  f32  — [g(F) | w(nc) | cell] f32, padded to a 128-lane multiple.  `cell`
         rides as an exact f32 integer (n_cells << 2^24).  At the K-Planes
         flagship width (F=96) this is 128 f32 lanes = 512 B/row.
  bf16 — [g(F) | w_hi(nc) | w_lo(nc) | local] bf16, padded to a 128-lane
         multiple.  HALF the permutation-gather bytes (the pipeline's
         gather-limited stage; round-5 adoption, BASELINE.md): the corner
         weights ride as an exact (hi, lo) bf16 pair (~16 mantissa bits) and
         the cell id rides as the WITHIN-WINDOW offset cell % w_window —
         values < 256 are exact in bf16, and the sort already fixes the
         window.  Only the cotangent g itself is quantized to bf16 (~2^-8
         relative) — the same precision class as the bf16 forward gathers
         the training step already runs.

DMA chunk bases are aligned DOWN to 32 rows (Mosaic requires provably
tile-aligned dynamic slices); rows outside [start, end) are masked in the
one-hot.

Precision: contributions are computed in f32 on the VPU, split into a bf16
(hi, lo) pair and accumulated with TWO bf16 matmuls into an f32 accumulator
— each term carries ~16 mantissa bits, so the f32-payload result matches
the f32 scatter reference to ~1e-5 relative (tests assert this); the bf16
payload adds only the g-quantization error (~2^-8, tests assert ~1e-2).

Replaces the backward of torch grid_sample (/root/reference/src/models.py:
105-113) in the K-Planes path; wired in via ops/interp.py's multiscale
lookup and models/kplanes.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitonic import pack_keys, packed_bits_ok, sort_i32, unpack_keys

_CHUNK = 512  # samples per DMA/matmul chunk
_ALIGN = 32  # DMA sublane alignment (covers f32/bf16/fp8 tile heights)


def _accum_kernel(
    offsets_ref,  # SMEM [P, NW + 1] i32 (scalar prefetch)
    packed_ref,  # HBM [P, M, F + nc + 1] f32, window-sorted
    out_ref,  # VMEM block [1, W, nc*F] f32
    buf,  # VMEM [C, F + nc + 1] f32 scratch
    sem,  # DMA semaphore
    *,
    w_window: int,
    f_dim: int,
    n_corners: int,
):
    p = pl.program_id(0)
    w = pl.program_id(1)
    start = offsets_ref[p, w]
    end = offsets_ref[p, w + 1]
    c = _CHUNK
    # chunk bases must be provably tile-aligned for the dynamic DMA slice;
    # rows in [base0, start) belong to the previous window and are masked
    base0 = pl.multiple_of((start // _ALIGN) * _ALIGN, _ALIGN)
    n_chunks = (end - base0 + (c - 1)) // c

    bf16_payload = packed_ref.dtype == jnp.bfloat16
    cell_base = w * w_window
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (c, w_window), 1)

    def body(ci, acc):
        base = pl.multiple_of(base0 + ci * c, _ALIGN)
        cp = pltpu.make_async_copy(
            packed_ref.at[p, pl.ds(base, c), :], buf, sem
        )
        cp.start()
        cp.wait()

        pos = base + iota_c  # [C, 1]
        valid = (pos >= start) & (pos < end)
        if bf16_payload:
            # bf16 layout: [g | w_hi | w_lo | local]; the cell column is
            # already the within-window offset (exact in bf16)
            local = buf[
                :, f_dim + 2 * n_corners : f_dim + 2 * n_corners + 1
            ].astype(jnp.int32)  # [C, 1]
            g = buf[:, :f_dim].astype(jnp.float32)  # [C, F]
            wts = [
                buf[:, f_dim + k : f_dim + k + 1].astype(jnp.float32)
                + buf[
                    :, f_dim + n_corners + k : f_dim + n_corners + k + 1
                ].astype(jnp.float32)
                for k in range(n_corners)
            ]
        else:
            cell = buf[:, f_dim + n_corners : f_dim + n_corners + 1].astype(
                jnp.int32
            )  # [C, 1]
            local = cell - cell_base
            g = buf[:, :f_dim]  # [C, F] f32
            wts = [
                buf[:, f_dim + k : f_dim + k + 1] for k in range(n_corners)
            ]
        onehot = ((iota_w == local) & valid).astype(jnp.bfloat16)  # [C, W]

        contrib = jnp.concatenate(
            [wk * g for wk in wts], axis=1
        )  # [C, nc*F] f32
        hi = contrib.astype(jnp.bfloat16)
        lo = (contrib - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            onehot, lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc

    acc0 = jnp.zeros((w_window, n_corners * f_dim), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, n_chunks, body, acc0)


def windowed_accumulate(
    packed_s: jax.Array,  # [P, M, fp] f32 or bf16 (see payload layouts above)
    offsets: jax.Array,  # [P, NW + 1] i32 cumulative counts per window
    f_dim: int,
    n_corners: int,
    n_cells_pad: int,
    w_window: int,
    interpret: bool | None = None,
) -> jax.Array:
    """-> [P, n_cells_pad, nc*F] f32: sum over samples i in each cell of
    concat_c(w[i, c] * g[i, :]).  M must include >= _CHUNK rows of slack
    past offsets[:, -1] (fixed-size DMA chunks; the tail is masked).
    The payload encoding is keyed on packed_s.dtype (module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, m, fp = packed_s.shape
    bf16_payload = packed_s.dtype == jnp.bfloat16
    assert fp >= f_dim + (2 if bf16_payload else 1) * n_corners + 1
    assert fp % 128 == 0, "packed rows must be 128-lane aligned for the DMA"
    assert n_cells_pad % w_window == 0
    nw = n_cells_pad // w_window
    assert offsets.shape == (p, nw + 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p, nw),
        in_specs=[
            # pinned to HBM: the kernel streams dynamic slices via DMA
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, w_window, n_corners * f_dim), lambda pi, wi, *_: (pi, wi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK, fp), packed_s.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = partial(
        _accum_kernel, w_window=w_window, f_dim=f_dim, n_corners=n_corners
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (p, n_cells_pad, n_corners * f_dim), jnp.float32
        ),
        interpret=interpret,
    )(offsets.astype(jnp.int32), packed_s)


# ------------------------------------------------------------------ pipeline


def sort_by_window(
    cell: jax.Array,  # [P, n] i32 cell ids in [0, n_cells_pad)
    n_cells_pad: int,
    w_window: int,
    interpret: bool | None = None,
):
    """Partition samples by table window.

    Returns (perm [P, n] i32 gather indices grouped by window ascending,
    offsets [P, NW + 1] i32 window sample ranges).  Within-window order is
    arbitrary (the accumulation is order-invariant up to f32 rounding)."""
    p, n = cell.shape
    nw = n_cells_pad // w_window
    assert packed_bits_ok(nw, n), (nw, n)
    idx_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    shift = int(np.log2(w_window))
    assert (1 << shift) == w_window, "w_window must be a power of two"
    keys = pack_keys(cell >> shift, idx_bits)
    skeys = sort_i32(keys, interpret=interpret)
    bucket, perm = unpack_keys(skeys, idx_bits)
    # window start offsets: first position with bucket >= w, per projection
    queries = jnp.arange(nw + 1, dtype=jnp.int32)
    offsets = jax.vmap(
        lambda b: jnp.searchsorted(b, queries, side="left")
    )(bucket).astype(jnp.int32)
    return perm, offsets


def table_grad_sorted(
    g: jax.Array,  # [P, n, F] cotangents f32
    w_corners: jax.Array,  # [P, n, nc] corner lerp weights f32
    cell: jax.Array,  # [P, n] i32 cell ids in [0, n_cells)
    n_cells: int,
    w_window: int = 256,
    interpret: bool | None = None,
    payload_dtype=jnp.float32,
) -> jax.Array:
    """Drop-in replacement for
    `zeros(n_cells, nc*F).at[cell].add(concat_c(w[:, :, c, None] * g))`
    built from sort_by_window + ONE packed permutation gather +
    windowed_accumulate.  Returns [P, n_cells, nc*F] f32.

    payload_dtype=bf16 halves the permutation-gather bytes (the pipeline's
    gather-limited stage) at the cost of quantizing g to bf16 (~2^-8
    relative); corner weights and cell ids stay exact (module docstring).
    """
    p, n, f_dim = g.shape
    nc = w_corners.shape[-1]
    n_cells_pad = -(-n_cells // w_window) * w_window
    perm, offsets = sort_by_window(cell, n_cells_pad, w_window, interpret)
    if payload_dtype == jnp.bfloat16:
        w_hi = w_corners.astype(jnp.bfloat16)
        w_lo = (w_corners - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        local = (cell % w_window)[:, :, None].astype(jnp.bfloat16)
        fp = f_dim + 2 * nc + 1
        fp_pad = -(-fp // 128) * 128
        parts = [g.astype(jnp.bfloat16), w_hi, w_lo, local]
        if fp_pad > fp:
            parts.append(jnp.zeros((p, n, fp_pad - fp), jnp.bfloat16))
    else:
        fp = f_dim + nc + 1
        fp_pad = -(-fp // 128) * 128  # lane-dim DMA slices must be 128-aligned
        parts = [g, w_corners, cell[:, :, None].astype(jnp.float32)]
        if fp_pad > fp:
            parts.append(jnp.zeros((p, n, fp_pad - fp), jnp.float32))
    packed = jnp.concatenate(parts, axis=-1)
    # flat global-row-id take instead of batched take_along_axis: folds the
    # projection dim into the row id so the permutation lowers like the
    # forward's fast per-scale row gathers (measured 33.6 -> 31.0 ms at the
    # flagship budget, tools/probe_bwd_stages.py round 5; bit-identical rows)
    flat = packed.reshape(p * n, packed.shape[-1])
    gidx = perm + (jnp.arange(p, dtype=perm.dtype) * n)[:, None]
    packed_s = jnp.take(flat, gidx.reshape(-1), axis=0).reshape(
        p, n, packed.shape[-1]
    )
    # DMA slack: fixed-size aligned chunks may read past the last valid row
    packed_s = jnp.pad(packed_s, ((0, 0), (0, _CHUNK), (0, 0)))
    out = windowed_accumulate(
        packed_s, offsets, f_dim, nc, n_cells_pad, w_window, interpret
    )
    return out[:, :n_cells]


def windowed_accumulate_ref(g_s, w_s, cell_s, n_cells):
    """jnp semantic reference (scatter-add) for numeric tests."""
    p, n, f_dim = g_s.shape
    nc = w_s.shape[-1]
    out = []
    for pi in range(p):
        contrib = jnp.concatenate(
            [w_s[pi, :, k : k + 1] * g_s[pi] for k in range(nc)], axis=1
        )
        out.append(
            jnp.zeros((n_cells, nc * f_dim), jnp.float32)
            .at[cell_s[pi]]
            .add(contrib)
        )
    return jnp.stack(out)
