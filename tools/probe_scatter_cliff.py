#!/usr/bin/env python
"""Re-measure the XLA TPU scatter-add row-count cliff that
`tinynerf_tpu.ops.interp._SCATTER_FAST_ROWS` encodes.

XLA's TPU scatter lowering switches strategy at ~2^19 OUTPUT rows; below the
cliff updates cost ~15-30 ns/row, above it ~10x more.  The lane-packing
trigger in `scatter_add_rows` keys on the measured constant 512096 (largest
row count measured fast on jax/jaxlib 0.9.0 + libtpu 0.0.34).  That constant
is a property of the TOOLCHAIN, not of this code: run this probe after any
jax/libtpu upgrade.  Exit status is nonzero if the recorded regime has
inverted (i.e. the packing trigger would mis-tune).

Usage: python tools/probe_scatter_cliff.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _time_scatter(n_rows: int, n_upd: int, width: int, iters: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(idx, contrib):
        out = jnp.zeros((n_rows, width), jnp.float32).at[idx].add(contrib)
        return jnp.sum(out)  # device-side reduce: sync via scalar fetch only

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_rows, size=n_upd).astype(np.int32))
    contrib = jnp.asarray(rng.normal(size=(n_upd, width)).astype(np.float32))
    float(f(idx, contrib))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(idx, contrib)
    float(s)  # relay-safe sync (block_until_ready is a no-op on axon)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import jax

    from tinynerf_tpu.ops.interp import _SCATTER_CLIFF_TOOLCHAIN, _SCATTER_FAST_ROWS

    try:
        import libtpu

        libtpu_ver = getattr(libtpu, "__version__", "?")
    except Exception:
        libtpu_ver = "?"
    cur = (jax.__version__, libtpu_ver)
    print(f"toolchain now: jax {cur[0]} libtpu {cur[1]}; "
          f"cliff measured on jax {_SCATTER_CLIFF_TOOLCHAIN[0]} "
          f"libtpu {_SCATTER_CLIFF_TOOLCHAIN[1]}")
    print(f"devices: {jax.devices()}")

    n_upd, width = 819_200, 64  # flagship-scale update stream, 256 B rows
    below = _time_scatter(_SCATTER_FAST_ROWS, n_upd, width)
    above = _time_scatter(1 << 21, n_upd, width)  # deep in the slow regime
    ns_below = below / n_upd * 1e9
    ns_above = above / n_upd * 1e9
    print(f"scatter-add {n_upd}x{width}f32 -> {_SCATTER_FAST_ROWS} rows: "
          f"{below * 1e3:.1f} ms ({ns_below:.1f} ns/row)")
    print(f"scatter-add {n_upd}x{width}f32 -> {1 << 21} rows: "
          f"{above * 1e3:.1f} ms ({ns_above:.1f} ns/row)")

    if above < 2.0 * below:
        print("CLIFF GONE OR MOVED: large-table scatters are no longer >=2x "
              "slower — the lane-packing trigger in scatter_add_rows is "
              "mis-tuned for this toolchain.  Re-sweep the row-count axis "
              "(tools/microbench.py) and update _SCATTER_FAST_ROWS.")
        return 1
    print(f"cliff intact ({ns_above / ns_below:.1f}x penalty above): "
          f"_SCATTER_FAST_ROWS = {_SCATTER_FAST_ROWS} remains valid.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
