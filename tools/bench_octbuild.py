#!/usr/bin/env python
"""Time the Pallas oct/quad build kernels vs the XLA interior-pad form (TPU).

Run: python tools/bench_octbuild.py
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
    float(jnp.sum(out.astype(jnp.float32)))  # relay-safe sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tinynerf_tpu.ops.interp import _build_oct, _build_quad
    from tinynerf_tpu.ops.octbuild import build_oct_pallas, build_quad_pallas

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    xla_oct = jax.jit(lambda t: _build_oct(t, jnp.bfloat16))
    xla_quad = jax.jit(lambda t: _build_quad(t, jnp.bfloat16))

    # the cobafa grid roster (basis 32..128 + coef 64) and the kplanes
    # fused-fine quad (513^2 x 96)
    tot_xla = tot_pal = 0.0
    for shape in [(128, 128, 128, 4), (108, 108, 108, 4), (89, 89, 89, 4),
                  (70, 70, 70, 8), (51, 51, 51, 8), (32, 32, 32, 8),
                  (64, 64, 64, 6)]:
        t = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = xla_oct(t)
        got = build_oct_pallas(t, jnp.bfloat16)
        equal = bool(jnp.all(ref == got))
        ms_x = timeit(xla_oct, t) * 1e3
        ms_p = timeit(build_oct_pallas, t) * 1e3
        tot_xla += ms_x
        tot_pal += ms_p
        gb = ref.size * 2 / 1e9
        print(f"oct {str(shape):>20} equal={equal} xla={ms_x:7.2f} ms "
              f"pallas={ms_p:7.2f} ms ({gb / (ms_p / 1e3):5.1f} GB/s)", flush=True)
    print(f"cobafa roster total: xla={tot_xla:.1f} ms pallas={tot_pal:.1f} ms",
          flush=True)

    # attribute the final [X, m2*8C] -> [M, 8C] lane-split reshape (the one
    # XLA op left in the pallas build path)
    x = jnp.zeros((127 * 127, 127 * 32), jnp.bfloat16)
    resh = jax.jit(lambda v: v.reshape(127 * 127 * 127, 32))
    ms = timeit(resh, x) * 1e3
    print(f"final lane-split reshape [16129, 4064]->[2M, 32] bf16: {ms:.2f} ms",
          flush=True)

    # IN-CONTEXT: the build feeds jnp.take — if XLA folds the final
    # lane-split reshape into the gather's index math, its standalone cost
    # vanishes here.  This is the number that decides adoption.
    import tinynerf_tpu.ops.interp as interp
    from tinynerf_tpu.ops.interp import trilinear_lookup_oct

    n_samp = 819_200
    coords = jnp.asarray(rng.uniform(-1, 1, (n_samp, 3)).astype(np.float32))

    def lookup_fwd(t, c):
        return trilinear_lookup_oct(t, c, jnp.bfloat16)

    def lookup_grad(t, c):
        return jax.grad(lambda tt: jnp.sum(lookup_fwd(tt, c)))(t)

    for mode in ("pad", "stack", "pallas"):
        interp._OCT_BUILD_MODE = mode
        f_fwd = jax.jit(lookup_fwd)
        f_grad = jax.jit(lookup_grad)
        for shape in [(128, 128, 128, 4), (64, 64, 64, 6)]:
            t = jnp.asarray(rng.normal(size=shape).astype(np.float32))
            ms_f = timeit(f_fwd, t, coords) * 1e3
            ms_g = timeit(f_grad, t, coords) * 1e3
            print(f"lookup {str(shape):>20} mode={mode} "
                  f"fwd={ms_f:7.2f} ms fwd+bwd={ms_g:7.2f} ms", flush=True)

    for shape in [(513, 513, 96), (513, 513, 32), (257, 257, 32)]:
        t = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = xla_quad(t)
        got = build_quad_pallas(t, jnp.bfloat16)
        equal = bool(jnp.all(ref == got))
        ms_x = timeit(xla_quad, t) * 1e3
        ms_p = timeit(build_quad_pallas, t) * 1e3
        gb = ref.size * 2 / 1e9
        print(f"quad {str(shape):>19} equal={equal} xla={ms_x:7.2f} ms "
              f"pallas={ms_p:7.2f} ms ({gb / (ms_p / 1e3):5.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
