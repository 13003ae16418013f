#!/usr/bin/env python
"""Primitive-cost microbenchmarks on the current backend.

Measures the TPU costs that drive the packed-path design: scalar gathers,
row gathers/scatters (plain vs sorted), top_k vs sort vs cumsum-based
compaction primitives. Run on the real chip; feeds BASELINE.md perf notes.

Usage: python tools/microbench.py [--set compaction|scatter|gather|all]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _scalar_of(x):
    return jnp.sum(x.astype(jnp.float32))


def _sync(out):
    """Force the stream via a device-side sum + 4-byte fetch (a bulk
    np.asarray would measure the relay's ~0.2 GB/s host link instead)."""
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
    print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def bench_gather(rng):
    print("--- gathers", flush=True)
    CAP = 819_200
    # scalar gather of CAP elements from small (VMEM-size) and large tables
    for tbl_n in (131_072, 2_097_152, 13_107_200):
        tbl = jnp.asarray(rng.normal(size=(tbl_n,)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, tbl_n, size=CAP).astype(np.int32))
        timeit(f"scalar gather {CAP} from [{tbl_n}] f32",
               jax.jit(lambda t, i: t[i]), tbl, idx)
    # scalar gather, R*S-many from the occupancy grid
    occ = jnp.asarray(rng.normal(size=(128 ** 3,)).astype(np.float32))
    for nq in (13_107_200, 26_214_400):
        idx = jnp.asarray(rng.integers(0, 128 ** 3, size=nq).astype(np.int32))
        timeit(f"scalar gather {nq} from [128^3] f32 (occ query)",
               jax.jit(lambda t, i: t[i]), occ, idx)
        idx8 = idx  # same indices, uint8 table
        occ8 = occ.astype(jnp.uint8)
        timeit(f"scalar gather {nq} from [128^3] u8  (occ query)",
               jax.jit(lambda t, i: t[i]), occ8, idx8)
    # row gathers: quad rows (128 f32 / bf16) like the kplanes fwd
    for n_rows_tbl, width, dt in ((261_121, 128, jnp.bfloat16),
                                  (261_121, 128, jnp.float32),
                                  (16_129, 128, jnp.bfloat16)):
        tbl = jnp.asarray(rng.normal(size=(n_rows_tbl, width))).astype(dt)
        idx = jnp.asarray(rng.integers(0, n_rows_tbl, size=CAP).astype(np.int32))
        timeit(f"row gather {CAP}x[{width}] {dt.__name__} from [{n_rows_tbl}]",
               jax.jit(lambda t, i: t[i]), tbl, idx)
    # 2D scalar gather (row, col) pairs — the within-row pick
    R, S = 32_768, 400
    tbl2 = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
    ridx = jnp.asarray(rng.integers(0, R, size=CAP).astype(np.int32))
    cidx = jnp.asarray(rng.integers(0, S, size=CAP).astype(np.int32))
    timeit(f"2D scalar gather {CAP} from [{R},{S}]",
           jax.jit(lambda t, r, c: t[r, c]), tbl2, ridx, cidx)


def bench_scatter(rng):
    print("--- scatters (kplanes bwd shape: quad rows)", flush=True)
    CAP = 819_200
    for n_rows_tbl in (16_129, 65_025, 261_121):
        contrib = jnp.asarray(rng.normal(size=(CAP, 128)).astype(np.float32))
        idx_np = rng.integers(0, n_rows_tbl, size=CAP).astype(np.int32)
        idx = jnp.asarray(idx_np)
        idx_sorted = jnp.asarray(np.sort(idx_np))

        def scat(i, c, n=n_rows_tbl):
            return jnp.zeros((n, 128), jnp.float32).at[i].add(c)

        def scat_sorted(i, c, n=n_rows_tbl):
            return jnp.zeros((n, 128), jnp.float32).at[i].add(
                c, indices_are_sorted=True)

        timeit(f"scatter-add {CAP}x[128] f32 into [{n_rows_tbl}]",
               jax.jit(scat), idx, contrib, n=5)
        timeit(f"scatter-add  (sorted idx + hint)   into [{n_rows_tbl}]",
               jax.jit(scat_sorted), idx_sorted, contrib, n=5)
        seg_sorted = jnp.asarray(np.sort(idx_np))
        timeit(f"segment_sum  (sorted ids)          into [{n_rows_tbl}]",
               jax.jit(lambda s, c, n=n_rows_tbl: jax.ops.segment_sum(
                   c, s, num_segments=n, indices_are_sorted=True)),
               seg_sorted, contrib, n=5)
    # small scatter: R rows into [CAP] (the marks trick)
    R = 131_072
    starts = jnp.asarray(np.sort(rng.integers(0, CAP, size=R)).astype(np.int32))
    ones = jnp.ones((R,), jnp.float32)
    timeit(f"scatter-add {R} scalars into [{CAP}] (marks)",
           jax.jit(lambda s, o: jnp.zeros((CAP,), jnp.float32).at[s].add(o)),
           starts, ones)
    # bf16 contrib scatter
    contrib16 = jnp.asarray(rng.normal(size=(CAP, 128))).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 261_121, size=CAP).astype(np.int32))
    timeit(f"scatter-add {CAP}x[128] bf16 into [261121]",
           jax.jit(lambda i, c: jnp.zeros((261_121, 128), jnp.bfloat16)
                   .at[i].add(c)), idx, contrib16, n=5)


def bench_compaction(rng):
    print("--- compaction primitives", flush=True)
    CAP = 819_200
    for mult in (16, 64):
        R = mult * 2048
        S = 400
        total = R * S
        mask_np = (rng.random((R, S)) < 0.05).astype(np.float32)
        maskb = jnp.asarray(mask_np) > 0

        def topk(mb):
            iota = jax.lax.broadcasted_iota(jnp.int32, (total,), 0)
            keys = jnp.where(mb.reshape(-1), iota, jnp.int32(total))
            neg_vals, _ = jax.lax.top_k(-keys, CAP)
            return -neg_vals

        timeit(f"[R={R}] top_k({CAP}) over {total}", jax.jit(topk), maskb, n=5)

        def sort_rows(mb):
            s_iota = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
            keys = jnp.where(mb, s_iota, jnp.int32(S))
            return jax.lax.sort(keys, dimension=1)

        timeit(f"[R={R}] sort [R,{S}] rows axis=1", jax.jit(sort_rows), maskb,
               n=5)

        def cumsums(mb):
            counts = jnp.sum(mb, axis=-1, dtype=jnp.int32)
            ends = jnp.cumsum(counts)
            wc = jnp.cumsum(mb.astype(jnp.int32), axis=-1)
            return ends, wc

        timeit(f"[R={R}] counts+cumsum [R] + row cumsum [R,{S}]",
               jax.jit(cumsums), maskb, n=5)

        def flat_sort(mb):
            iota = jax.lax.broadcasted_iota(jnp.int32, (total,), 0)
            keys = jnp.where(mb.reshape(-1), iota, jnp.int32(total))
            return jax.lax.sort(keys)

        timeit(f"[R={R}] full sort over {total}", jax.jit(flat_sort), maskb,
               n=3)

    # sort CAP keys with payload (for scatter dedup)
    keys = jnp.asarray(rng.integers(0, 261_121, size=CAP).astype(np.int32))
    payload = jnp.asarray(np.arange(CAP, dtype=np.int32))
    timeit(f"sort {CAP} int32 keys + int32 payload",
           jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), keys,
           payload, n=5)
    # searchsorted: CAP queries into [R] table
    tbl = jnp.asarray(np.sort(rng.integers(0, total, size=32_768)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, total, size=CAP).astype(np.int32))
    timeit("searchsorted [32768] x 819200 queries",
           jax.jit(lambda t, qq: jnp.searchsorted(t, qq)), tbl, q, n=5)
    # cumsum over CAP (slot bookkeeping)
    v = jnp.asarray(rng.normal(size=(CAP,)).astype(np.float32))
    timeit("cumsum over [819200] f32", jax.jit(jnp.cumsum), v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="all",
                    choices=["gather", "scatter", "compaction", "all"])
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    if args.set in ("gather", "all"):
        bench_gather(rng)
    if args.set in ("scatter", "all"):
        bench_scatter(rng)
    if args.set in ("compaction", "all"):
        bench_compaction(rng)


if __name__ == "__main__":
    main()
