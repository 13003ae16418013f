#!/usr/bin/env python
"""Focused A/B: sorted-window table-grad pipeline TOTAL, f32 vs bf16 payload.

Round 5's probe_bwd_stages run showed the payload permutation gather is
row-latency-floored, not byte-floored (bf16 rows gather SLOWER than f32:
36.3 vs 33.6 ms; bitcast-packing bf16 pairs into 64 f32 lanes is worse
still at 46.5), which undercuts the round-5 `sorted_bf16` adoption's
byte-halving rationale.  The full pipeline also packs the payload (writes)
and DMA-streams it in the accumulate kernel (reads), where bf16 still
halves bytes — so the DECISION needs pipeline totals, which the staged
probe timed out before reaching.  This probe measures ONLY the two totals
(plus the XLA scatter baseline for the floor audit) on the shipped flat-
take implementation.

Run: python tools/probe_payload_ab.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tinynerf_tpu.ops.table_grad import (
        table_grad_sorted,
        windowed_accumulate_ref,
    )

    def timeit(f, *args, iters=10):
        out = f(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n, p, f_tot, nc = 819_200, 3, 96, 4
    r_fine = 513
    n_cells = (r_fine - 1) * (r_fine - 1)
    w_window = 256

    g = jnp.asarray(rng.normal(size=(p, n, f_tot)).astype(np.float32))
    w4 = jnp.asarray(rng.uniform(size=(p, n, nc)).astype(np.float32))
    cell = jnp.asarray(rng.integers(0, n_cells, size=(p, n)).astype(np.int32))

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        tg = jax.jit(
            lambda g, w, c, dt=dt: table_grad_sorted(
                g, w, c, n_cells, w_window=w_window, payload_dtype=dt
            )
        )
        ms = timeit(tg, g, w4, cell)
        print(f"table_grad_sorted[{name}] (flat take): {ms:7.2f} ms",
              flush=True)

    @jax.jit
    def xla_scatter(g, w, c):
        return windowed_accumulate_ref(g, w, c, n_cells)

    ms = timeit(xla_scatter, g, w4, cell)
    print(f"3x XLA scatter baseline:              {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
