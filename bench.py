#!/usr/bin/env python
"""Training-throughput benchmark: rays/sec/chip on the flagship config
(K-Planes, AABB scene, batch 2048 rays x 400 samples — the reference's
default schedule, reference train.py:17-18).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is value / BASELINE_RAYS_PER_SEC where the baseline constant is
the reference-class CUDA trainer throughput anchor (the reference itself
publishes no numbers — BASELINE.md; 100k rays/s is the provisional anchor for
an occupancy-grid + packed-samples CUDA trainer at this config; the north-star
target is 5x that per chip).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 100_000.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tinynerf_tpu.parallel import make_mesh
    from tinynerf_tpu.train import TrainConfig, build_renderer, make_optimizer
    from tinynerf_tpu.train.loop import make_occupancy_update, make_train_step

    mesh = make_mesh()
    n_dev = mesh.devices.size

    cfg = TrainConfig(
        method="kplanes",
        scene_type="aabb",
        batch_size=2048,
        n_samples=400,
        occupancy_res=128,
    )
    renderer = build_renderer(cfg, scene_scale=1.0, bg_color=np.ones(3, np.float32))
    optimizer = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    params = renderer.init(key)
    opt_state = optimizer.init(params)
    occ_state = renderer.occupancy.init_state()

    # synthetic ray pool: cameras on a sphere of radius 4 looking inward
    rng = np.random.default_rng(0)
    n_pool = 1 << 20
    d = rng.normal(size=(n_pool, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -4.0 * d + 0.1 * rng.normal(size=(n_pool, 3)).astype(np.float32)
    rgb = rng.uniform(size=(n_pool, 3)).astype(np.float32)

    sh = NamedSharding(mesh, P("data"))
    pool_o = jax.device_put(o, sh)
    pool_d = jax.device_put(d, sh)
    pool_rgb = jax.device_put(rgb, sh)

    occ_update = make_occupancy_update(renderer)
    occ_state = occ_update(params, occ_state, jax.random.PRNGKey(1))

    bucket = 1
    step_fn = make_train_step(
        renderer, optimizer, cfg, mesh, n_cand=bucket * cfg.batch_size
    )

    def run(n_steps: int, params, opt_state):
        m = None
        for i in range(n_steps):
            params, opt_state, m = step_fn(
                params, opt_state, occ_state,
                pool_o, pool_d, pool_rgb, jax.random.PRNGKey(100 + i),
            )
        jax.block_until_ready(m["loss"])
        return params, opt_state

    # warmup / compile
    params, opt_state = run(3, params, opt_state)

    n_steps = 30
    t0 = time.perf_counter()
    params, opt_state = run(n_steps, params, opt_state)
    elapsed = time.perf_counter() - t0

    rays_per_sec_per_chip = bucket * cfg.batch_size * n_steps / elapsed / n_dev

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec_per_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec_per_chip / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
