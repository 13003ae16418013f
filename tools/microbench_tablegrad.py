#!/usr/bin/env python
"""Microbenchmark of the sorted-window table-gradient pipeline on TPU.

Times, at the flagship budget (cap=819200 samples, fine grid 513, f_tot=96):
  * the in-VMEM bitonic partition sort (ops/bitonic.py)
  * sort_by_window (sort + searchsorted)
  * the permutation gathers
  * windowed_accumulate at several window widths
  * the XLA scatter-add reference it replaces
  * the full multiscale-lookup bwd (sorted vs scatter) per projection

Usage: python tools/microbench_tablegrad.py [--cap 819200] [--f 96]
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _scalar_of(x):
    return jnp.sum(x.astype(jnp.float32))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(_scalar_of(leaf))


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=819200)
    ap.add_argument("--f", type=int, default=96)
    ap.add_argument("--r_fine", type=int, default=513)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    from tinynerf_tpu.ops.bitonic import pack_keys, sort_i32
    from tinynerf_tpu.ops.interp import bilinear_lookup_multiscale
    from tinynerf_tpu.ops.table_grad import (
        sort_by_window,
        table_grad_sorted,
        windowed_accumulate,
    )

    cap, f_tot = args.cap, args.f
    n_cells = (args.r_fine - 1) ** 2
    rng = np.random.default_rng(0)
    # ray-realistic cells: consecutive runs of samples along random lines
    n_rays = cap // 25
    t = np.linspace(0, 1, 25, dtype=np.float32)
    a = rng.uniform(0, args.r_fine - 1, size=(n_rays, 2)).astype(np.float32)
    b = rng.uniform(0, args.r_fine - 1, size=(n_rays, 2)).astype(np.float32)
    pts = a[:, None, :] + (b - a)[:, None, :] * t[None, :, None]
    cell_np = (
        pts[..., 0].astype(np.int32) * (args.r_fine - 1)
        + pts[..., 1].astype(np.int32)
    ).reshape(-1)[:cap]
    cell = jnp.asarray(cell_np[None], jnp.int32)
    g = jnp.asarray(rng.normal(size=(1, cap, f_tot)).astype(np.float32))
    w4 = jnp.asarray(rng.uniform(size=(1, cap, 4)).astype(np.float32))

    keys = pack_keys(cell >> 8, 20)
    timeit("bitonic sort [1, 2^20]", jax.jit(sort_i32), keys, n=args.n)

    for w in (128, 256, 512):
        f = jax.jit(partial(sort_by_window, n_cells_pad=-(-n_cells // w) * w,
                            w_window=w))
        timeit(f"sort_by_window (W={w})", f, cell, n=args.n)

    @jax.jit
    def gathers(g, w4, cell, perm):
        take = lambda a, ix: jnp.take_along_axis(a, ix, axis=1)
        return (
            take(g.astype(jnp.bfloat16), perm[:, :, None]),
            take(w4, perm[:, :, None]),
            take(cell, perm),
        )

    perm, offsets = jax.jit(
        partial(sort_by_window, n_cells_pad=-(-n_cells // 256) * 256, w_window=256)
    )(cell)
    timeit("perm gathers (g bf16 + w4 + cell)", gathers, g, w4, cell, perm,
           n=args.n)

    for w in (128, 256, 512):
        fn = jax.jit(partial(table_grad_sorted, n_cells=n_cells, w_window=w))
        timeit(f"table_grad_sorted full (W={w})", fn, g, w4, cell, n=args.n)

    @jax.jit
    def scatter_ref(g, w4, cell):
        contrib = jnp.concatenate(
            [w4[0, :, k : k + 1] * g[0] for k in range(4)], axis=1
        )
        return jnp.zeros((n_cells, 4 * f_tot), jnp.float32).at[cell[0]].add(contrib)

    timeit("XLA scatter-add reference", scatter_ref, g, w4, cell,
           n=max(3, args.n // 2))

    # full multiscale bwd per projection (scales 129/257/513, F=32)
    key = jax.random.PRNGKey(0)
    tables = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (r, r, 32))
        for i, r in enumerate((129, 257, 513))
    )
    coords = jax.random.uniform(jax.random.PRNGKey(1), (cap, 2), minval=-1, maxval=1)
    cot = jax.random.normal(jax.random.PRNGKey(2), (cap, 96))

    for impl in ("scatter", "sorted"):
        @jax.jit
        def msbwd(ts, coords, cot, impl=impl):
            def f(ts):
                out = bilinear_lookup_multiscale(ts, coords, jnp.float8_e4m3fn, impl)
                return jnp.sum(out * cot)
            return jax.grad(f)(ts)

        timeit(f"multiscale lookup fwd+bwd ({impl})", msbwd, tables, coords,
               cot, n=max(3, args.n // 2))


if __name__ == "__main__":
    main()
