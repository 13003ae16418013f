#!/usr/bin/env python
"""Fit the TPU scatter/gather cost model the round-4 floor audit rests on.

Measures, on the flagship K-Planes table shapes:
  * scatter-add time vs UPDATE row count at fixed output table (513^2 quad,
    [262144, 384] f32) -> per-row slope + per-call intercept.  The intercept
    is what dominates the projected v5e-8 step (rows divide by 8, the
    intercept does not), so the audit needs it measured, not inferred.
  * row-gather time vs row count at the fused-fine width (384 B fp8-equiv
    and 768 B bf16 rows) -> ns per 128-lane group.
Prints a fitted model plus the raw points for BASELINE.md.

Run: python tools/audit_scatter_model.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(f, *args, iters=10):
    import jax.numpy as jnp

    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    n_rows_out = 512 * 512  # the fine 513^2 quad table's row count
    width = 96 * 4  # fused-fine: 3 scales x 32 feats x 4 corners, f32 grad

    @jax.jit
    def scat(idx, upd):
        return jnp.zeros((n_rows_out, width), jnp.float32).at[idx].add(upd)

    pts = []
    for n in (51_200, 102_400, 204_800, 409_600, 819_200):
        idx = jnp.asarray(rng.integers(0, n_rows_out, n).astype(np.int32))
        upd = jnp.asarray(rng.normal(size=(n, width)).astype(np.float32))
        ms = timeit(scat, idx, upd) * 1e3
        pts.append((n, ms))
        print(f"scatter {n:>8} rows x {width * 4} B -> [{n_rows_out}, {width}]: "
              f"{ms:7.2f} ms ({ms * 1e6 / n:6.1f} ns/row incl. fixed)", flush=True)
    ns_, ms_ = np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
    slope, intercept = np.polyfit(ns_, ms_, 1)
    print(f"scatter model: {slope * 1e6:.1f} ns/row + {intercept:.2f} ms/call",
          flush=True)

    # gathers: fused-fine forward rows (fp8 384 B = 3 lane groups;
    # bf16 768 B = 6 groups) from the fine quad table
    for dt, w, name in ((jnp.float8_e4m3fn, 384, "fp8[384]"),
                        (jnp.bfloat16, 384, "bf16[384]")):
        tbl = jnp.asarray(
            rng.normal(size=(n_rows_out, w)).astype(np.float32)
        ).astype(dt)

        @jax.jit
        def gath(idx, tbl=tbl):
            return jnp.take(tbl, idx, axis=0)

        for n in (204_800, 819_200):
            idx = jnp.asarray(rng.integers(0, n_rows_out, n).astype(np.int32))
            ms = timeit(gath, idx) * 1e3
            groups = -(-w * jnp.dtype(dt).itemsize // 128)
            print(f"gather {name} {n:>8} rows: {ms:7.2f} ms "
                  f"({ms * 1e6 / n:5.1f} ns/row, {ms * 1e6 / n / groups:5.1f} "
                  f"ns/group x {groups} groups)", flush=True)


if __name__ == "__main__":
    main()
