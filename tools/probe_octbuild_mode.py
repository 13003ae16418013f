#!/usr/bin/env python
"""A/B the cell-pack build formulations (interp._OCT_BUILD_MODE /
_QUAD_BUILD_MODE: interior-pad vs slice-stack vs Pallas) on the shipping
roster shapes.

History (why this probe exists): the winner has flipped with EVERY
toolchain move — round 3 measured stack ~21 ms for a 128^3x4 oct grid and
adopted pad; round 4 re-measured pad at ~7.7 ms; round 5's toolchain
(jax 0.9.0 / libtpu 0.0.34) has pad at ~63 ms and stack at ~11 ms on the
same shape, which put the full cobafa oct rebuild at 148 ms/step and the
method at 1.04x of baseline (VERDICT round 4 weakness #2).  Run this after
any jax/libtpu bump before trusting the pinned defaults.

Run: python tools/probe_octbuild_mode.py [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(name, f, *args, iters=10):
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
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:9.2f} ms", flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tinynerf_tpu.ops import interp as I

    rng = np.random.default_rng(0)
    gd = jnp.bfloat16

    # ---- 3-D (oct) roster: the cobafa grids (coef 64^3x6 + 6 basis grids)
    oct_shapes = [
        (64, 64, 64, 6),
        (32, 32, 32, 8), (51, 51, 51, 8), (70, 70, 70, 8),
        (89, 89, 89, 4), (108, 108, 108, 4), (128, 128, 128, 4),
    ]
    octs = [
        jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in oct_shapes
    ]
    modes = ["pad", "stack"]
    if jax.default_backend() == "tpu":
        modes.append("pallas")
    print(f"backend={jax.default_backend()}  jax={jax.__version__}")

    print("\n-- oct builds (per grid) --")
    totals = {}
    for mode in modes:
        I._OCT_BUILD_MODE = mode
        tot = 0.0
        for t in octs:
            fn = jax.jit(lambda t: I._build_oct(t, gd))
            tot += timeit(f"oct {str(t.shape):>20} mode={mode}", fn, t,
                          iters=args.iters)
        totals[mode] = tot
        print(f"   TOTAL roster mode={mode}: {tot:.2f} ms")

    print("\n-- oct roster in ONE jit (the shipped cadence) --")
    for mode in modes:
        I._OCT_BUILD_MODE = mode

        @jax.jit
        def all_builds(octs):
            return tuple(I._build_oct(t, gd) for t in octs)

        timeit(f"ALL 7 oct builds mode={mode}", all_builds, tuple(octs),
               iters=args.iters)

    # ---- 2-D (quad) roster: K-Planes planes (129/257/513 x F=32) and the
    # fused fine table (513^2 x 96)
    quad_shapes = [(129, 129, 32), (257, 257, 32), (513, 513, 32),
                   (513, 513, 96)]
    quads = [
        jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in quad_shapes
    ]
    print("\n-- quad builds --")
    for mode in modes:
        I._QUAD_BUILD_MODE = mode
        tot = 0.0
        for t in quads:
            fn = jax.jit(lambda t: I._build_quad(t, gd))
            tot += timeit(f"quad {str(t.shape):>18} mode={mode}", fn, t,
                          iters=args.iters)
        print(f"   TOTAL quad roster mode={mode}: {tot:.2f} ms")

    # ---- numeric equality across modes (any backend)
    from tinynerf_tpu.ops.octbuild import build_oct_ref, build_quad_ref

    t3 = octs[1]
    t2 = quads[0]
    for mode in modes:
        if mode == "pallas" and jax.default_backend() != "tpu":
            continue
        I._OCT_BUILD_MODE = mode
        I._QUAD_BUILD_MODE = mode
        a = jax.jit(lambda t: I._build_oct(t, gd))(t3)
        b = jax.jit(lambda t: I._build_quad(t, gd))(t2)
        assert bool(jnp.all(a == build_oct_ref(t3, gd))), f"oct {mode} differs"
        assert bool(jnp.all(b == build_quad_ref(t2, gd))), f"quad {mode} differs"
    print("\nnumeric equality across modes: OK")


if __name__ == "__main__":
    main()
