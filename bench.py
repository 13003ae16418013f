#!/usr/bin/env python
"""Training-throughput benchmark: rays/sec/chip on the flagship config
(K-Planes, AABB scene, 2048-ray x 400-sample budget — the reference's default
schedule, reference train.py:17-18).

Measures STEADY-STATE training throughput: the occupancy grid is set to a
converged-like state (a small occupied ball, ~matching a trained Blender
scene where ~5% of samples survive culling), so the bucketed candidate
batching runs at a realistic multiplier — the same regime the reference's
dynamic batching reaches after its occupancy grid converges.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 100k rays/s — the provisional anchor for a
reference-class CUDA occupancy-grid trainer at this config (the reference
itself publishes no numbers; BASELINE.md).  North star: 5x per chip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 100_000.0
N_STEPS = 20


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tinynerf_tpu.parallel import make_mesh
    from tinynerf_tpu.train import TrainConfig, build_renderer, make_optimizer
    from tinynerf_tpu.train.loop import MarchPolicy, make_train_step, pick_bucket
    from tinynerf_tpu.utils import make_shell_occupancy

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=2048,
                    help="ray batch (the reference CLI default; its bs_ratio "
                         "rule anchors hyperparameters at 4096)")
    ap.add_argument("--method", default="kplanes")
    ap.add_argument("--scene_type", default="aabb", choices=["aabb", "unbounded"])
    args = ap.parse_args()

    mesh = make_mesh()
    n_dev = mesh.devices.size

    cfg = TrainConfig(
        method=args.method,
        scene_type=args.scene_type,
        batch_size=args.batch_size,
        n_samples=400,
        occupancy_res=128,
    )
    renderer = build_renderer(cfg, scene_scale=1.0, bg_color=np.ones(3, np.float32))
    optimizer = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    params = renderer.init(key)
    opt_state = optimizer.init(params)

    # converged-like occupancy (shared with tools/profile_step.py)
    occ_state = make_shell_occupancy(renderer, cfg.occupancy_res)

    # ray pool: cameras on a sphere of radius 4 aimed at the scene center
    rng = np.random.default_rng(0)
    n_pool = 1 << 20
    d = rng.normal(size=(n_pool, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -4.0 * d
    rgb = rng.uniform(size=(n_pool, 3)).astype(np.float32)

    sh = NamedSharding(mesh, P("data"))
    pool_o = jax.device_put(o, sh)
    pool_d = jax.device_put(d, sh)
    pool_rgb = jax.device_put(rgb, sh)

    # steady-state bucket: largest whose expected demand fits the cap
    # (probe with one bucket-1 step to estimate samples/ray)
    probe_fn = make_train_step(renderer, optimizer, cfg, mesh, n_cand=cfg.batch_size)
    # NB: the step donates params/opt_state buffers — keep using the outputs
    params, opt_state, m = probe_fn(
        params, opt_state, occ_state, pool_o, pool_d, pool_rgb, jax.random.PRNGKey(9)
    )
    fill = float(m["fill"])
    rays = float(m["rays_used"])
    avg_spr = max(1.0, fill * cfg.sample_cap / max(rays, 1.0))
    bucket = pick_bucket(cfg, avg_spr)
    print(
        f"probe: fill={fill:.3f} avg_samples/ray={avg_spr:.1f} bucket={bucket}",
        file=sys.stderr,
    )

    # march mode: THE training loop's policy object (not a copy of it)
    march = MarchPolicy(
        renderer.supports_skip_march, cfg.march, renderer.skip_steps
    ).pick(avg_spr)
    grid_args = ()
    if march == "skip":
        skip_grid = jax.jit(renderer.skip_grid)(occ_state)
        grid_args = (skip_grid,)
    print(f"march mode: {march}", file=sys.stderr)

    n_cand = bucket * cfg.batch_size
    step_fn = make_train_step(
        renderer, optimizer, cfg, mesh, n_cand=n_cand, march=march
    )

    def run(n_steps: int, params, opt_state):
        ms = []
        for i in range(n_steps):
            params, opt_state, m = step_fn(
                params, opt_state, occ_state, *grid_args,
                pool_o, pool_d, pool_rgb, jax.random.PRNGKey(100 + i),
            )
            ms.append(m["rays_used"])
        # device_get forces a real sync (block_until_ready is unreliable on
        # some experimental PJRT plugins)
        rays_used = float(sum(jax.device_get(ms)))
        return params, opt_state, rays_used

    # warmup / compile (two rounds: donated-buffer layouts can trigger one
    # recompile after the first execution)
    params, opt_state, _ = run(2, params, opt_state)
    params, opt_state, _ = run(2, params, opt_state)

    t0 = time.perf_counter()
    params, opt_state, rays_used = run(N_STEPS, params, opt_state)
    elapsed = time.perf_counter() - t0

    # count only rays that actually contributed to the loss (rays spilled
    # past the sample cap are excluded by the trainer and don't count)
    rays_per_sec_per_chip = rays_used / elapsed / n_dev
    print(
        f"steady state: {elapsed/N_STEPS*1e3:.1f} ms/step, "
        f"{n_cand} candidate rays/step ({rays_used/N_STEPS:.0f} trained), "
        f"{n_dev} device(s)",
        file=sys.stderr,
    )

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
    try:
        main()
    except Exception as e:  # the TPU relay's compile helper 500s transiently
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              f"retrying once", file=sys.stderr)
        time.sleep(30)
        main()
