#!/usr/bin/env python
"""Stage-level timing of the K-Planes fused backward at the flagship budget:
sort_by_window, the payload permutation gather (f32 vs bf16 packing),
windowed_accumulate, the XLA scatter alternative, _fine_from_quad, and
_pullback_scales — so the ~113 ms field backward is attributed on TODAY'S
toolchain instead of round-3 stage numbers.

Also times the per-device 8-chip regime (n/8 = 102,400 samples) for both
bwd impls — the crossover that decides what the v5e-8 step should run.

Run: python tools/probe_bwd_stages.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(f, *args, iters=10):
    import jax
    import jax.numpy as jnp

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tinynerf_tpu.ops.interp import (
        _fine_from_quad,
        _pullback_scales,
        scatter_add_rows,
    )
    from tinynerf_tpu.ops.table_grad import (
        sort_by_window,
        table_grad_sorted,
        windowed_accumulate,
    )

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    for n in (819_200, 102_400):
        p, f_tot, nc = 3, 96, 4
        r_fine = 513
        n_cells = (r_fine - 1) * (r_fine - 1)
        w_window = 256
        n_cells_pad = -(-n_cells // w_window) * w_window

        g = jnp.asarray(rng.normal(size=(p, n, f_tot)).astype(np.float32))
        w4 = jnp.asarray(rng.uniform(size=(p, n, nc)).astype(np.float32))
        cell = jnp.asarray(
            rng.integers(0, n_cells, size=(p, n)).astype(np.int32)
        )
        print(f"\n=== n={n} (x{p} projections) ===", flush=True)

        sortfn = jax.jit(
            lambda c: sort_by_window(c, n_cells_pad, w_window)
        )
        ms = timeit(sortfn, cell)
        print(f"sort_by_window:              {ms:7.2f} ms", flush=True)
        perm, offsets = jax.jit(
            lambda c: sort_by_window(c, n_cells_pad, w_window)
        )(cell)

        for name, dt in (("f32[128L]", jnp.float32), ("bf16[128L]", jnp.bfloat16)):
            payload = jnp.asarray(
                rng.normal(size=(p, n, 128)).astype(np.float32)
            ).astype(dt)

            @jax.jit
            def permgather(pl, pm):
                return jnp.take_along_axis(pl, pm[:, :, None], axis=1)

            ms = timeit(permgather, payload, perm)
            print(f"perm gather {name}:        {ms:7.2f} ms", flush=True)

            # flat-table variant: fold the projection dim into a global row
            # id so the gather is a plain [P*n, L] row take — the same
            # lowering as the forward's fast per-scale gathers — instead of
            # a batched take_along_axis
            @jax.jit
            def permgather_flat(pl, pm):
                flat = pl.reshape(p * n, pl.shape[-1])
                gidx = pm + (jnp.arange(p, dtype=pm.dtype) * n)[:, None]
                return jnp.take(flat, gidx.reshape(-1), axis=0)

            ms = timeit(permgather_flat, payload, perm)
            print(f"perm gather {name} FLAT:   {ms:7.2f} ms", flush=True)

        # bf16 payload bitcast-packed into f32 lanes: halves bytes while
        # keeping the gather row f32-shaped (dodges the narrow-dtype rate
        # penalty if that is what slows the bf16 row)
        payload16 = jnp.asarray(
            rng.normal(size=(p, n, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        packed32 = jax.lax.bitcast_convert_type(
            payload16.reshape(p, n, 64, 2), jnp.float32
        )  # [p, n, 64]

        @jax.jit
        def permgather_cast(pl, pm):
            flat = pl.reshape(p * n, pl.shape[-1])
            gidx = pm + (jnp.arange(p, dtype=pm.dtype) * n)[:, None]
            rows = jnp.take(flat, gidx.reshape(-1), axis=0)
            return jax.lax.bitcast_convert_type(
                rows.reshape(p, n, 64, 1), jnp.bfloat16
            ).reshape(p, n, 128)

        ms = timeit(permgather_cast, packed32, perm)
        print(f"perm gather bf16 PACKED[64L f32]: {ms:7.2f} ms", flush=True)

        # full pipeline + kernel-only, both payloads
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            tg = jax.jit(
                lambda g, w, c, dt=dt: table_grad_sorted(
                    g, w, c, n_cells, w_window=w_window, payload_dtype=dt
                )
            )
            ms = timeit(tg, g, w4, cell)
            print(f"table_grad_sorted[{name}]:    {ms:7.2f} ms", flush=True)

        # accumulation kernel alone (pre-sorted input, f32 payload)
        fp_pad = 128
        packed = jnp.concatenate(
            [g, w4, cell[:, :, None].astype(jnp.float32),
             jnp.zeros((p, n, fp_pad - f_tot - nc - 1), jnp.float32)],
            axis=-1,
        )
        packed_s = jnp.take_along_axis(packed, perm[:, :, None], axis=1)
        packed_s = jnp.pad(packed_s, ((0, 0), (0, 512), (0, 0)))
        acc = jax.jit(
            lambda ps, off: windowed_accumulate(
                ps, off, f_tot, nc, n_cells_pad, w_window
            )
        )
        ms = timeit(acc, packed_s, offsets)
        print(f"windowed_accumulate:         {ms:7.2f} ms", flush=True)

        # XLA scatter alternative (per projection, fused rows)
        @jax.jit
        def scat(g, w4, cell):
            outs = []
            for pi in range(p):
                contrib = (w4[pi, :, :, None] * g[pi, :, None, :]).reshape(
                    n, nc * f_tot
                )
                outs.append(scatter_add_rows(n_cells, cell[pi], contrib))
            return outs

        ms = timeit(scat, g, w4, cell)
        print(f"3x XLA scatter:              {ms:7.2f} ms", flush=True)

    # table-sized stages (n-independent)
    gq = jnp.asarray(
        rng.normal(size=(512 * 512, 4 * 96)).astype(np.float32)
    )
    ffq = jax.jit(lambda x: _fine_from_quad(x, 513, 96))
    ms = timeit(ffq, gq)
    print(f"\n_fine_from_quad (1 proj):    {ms:7.2f} ms", flush=True)
    fine = jax.jit(lambda x: _fine_from_quad(x, 513, 96))(gq)
    tables = tuple(
        jnp.zeros((r, r, 32), jnp.float32) for r in (129, 257, 513)
    )
    pb = jax.jit(lambda fn: _pullback_scales(fn, tables))
    ms = timeit(pb, fine)
    print(f"_pullback_scales (1 proj):   {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
