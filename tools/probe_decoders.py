#!/usr/bin/env python
"""A/B the decoder stack: posenc form (matmul vs stack) x feature pieces
(split first layer vs concatenated), fwd+bwd at the flagship budget.

Run: python tools/probe_decoders.py
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
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tinynerf_tpu.models import encodings
    from tinynerf_tpu.models.vanilla import ColorDecoder, OpacityDecoder

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n = 819_200
    feats3 = tuple(
        jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32)) for _ in range(3)
    )
    feats = jnp.concatenate(feats3, axis=-1)
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    sd = OpacityDecoder(feature_dim=96)
    rd = ColorDecoder(n_freqs=8, in_features=96, hidden_features=64, hidden_layers=3)
    key = jax.random.PRNGKey(0)
    params = {"sigma": sd.init(key), "rgb": rd.init(jax.random.fold_in(key, 1))}

    for impl in ("matmul", "stack"):
        encodings._IMPL = impl
        for label, f_in in (("pieces", feats3), ("concat", feats)):

            @jax.jit
            def both(p, f_in=f_in):
                s = sd.apply(p["sigma"], f_in, jnp.bfloat16)
                c = rd.apply(p["rgb"], f_in, dirs, jnp.bfloat16)
                return jnp.sum(s) + jnp.sum(c)

            @jax.jit
            def grad(p, both=both):
                return jax.grad(both)(p)

            ms_f = timeit(both, params) * 1e3
            ms_g = timeit(grad, params) * 1e3
            print(f"posenc={impl:6s} feats={label:6s}: fwd {ms_f:6.2f} ms  "
                  f"fwd+bwd {ms_g:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
