#!/usr/bin/env python
"""Component-level timing of the train step on the current backend.

Times each stage of the packed render path in isolation (with device_get
syncs) to locate the bottleneck.  Not part of the library; a perf tool.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.core import ContractionAABB, OccupancyGrid, RayMarcherAABB
from tinynerf_tpu.models import make_model
from tinynerf_tpu.ops import compute_weights
from tinynerf_tpu.train import TrainConfig, build_renderer

AABB = ((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5))


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.tree_util.tree_leaves(out)[0]), out
    )
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:35s} {dt*1e3:9.2f} ms")
    return out


def main():
    R, S = 2048, 400
    CAP = R * S
    cfg = TrainConfig(method="kplanes", batch_size=R, n_samples=S, occupancy_res=128)
    renderer = build_renderer(cfg, 1.0, np.ones(3, np.float32))
    key = jax.random.PRNGKey(0)
    params = renderer.init(key)
    occ_state = renderer.occupancy.init_state()

    rng = np.random.default_rng(0)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-4.0 * d)
    rays_d = jnp.asarray(d)
    rgbs = jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32))

    marcher = renderer.marcher
    contraction = renderer.contraction

    # stage: march + contract + occupancy mask
    @jax.jit
    def stage_march(occ_state, rays_o, rays_d):
        t, deltas = marcher(rays_o, rays_d)
        pos = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        cpos, maskf = contraction(pos)
        maskf = maskf * renderer.occupancy.query(occ_state, cpos)
        return cpos, deltas, maskf

    cpos, deltas, maskf = timeit("march+contract+occquery", stage_march, occ_state, rays_o, rays_d)

    # stage: compaction (top_k partial selection + gathers — the shipped path)
    @jax.jit
    def stage_compact(cpos, maskf):
        total = R * S
        iota = jax.lax.broadcasted_iota(jnp.int32, (total,), 0)
        keys = jnp.where((maskf > 0).reshape(-1), iota, jnp.int32(total))
        neg_vals, _ = jax.lax.top_k(-keys, min(CAP, total))
        valid_idx = -neg_vals
        is_pad = valid_idx >= total
        safe = jnp.where(is_pad, 0, valid_idx)
        return cpos.reshape(total, 3)[safe], safe // S, is_pad

    cpos_cap, seg, is_pad = timeit("compaction (top_k)", stage_compact, cpos, maskf)

    # stage: field eval on CAP points
    @jax.jit
    def stage_field(params, x):
        return renderer.field.apply(params["field"], x)

    feats = timeit("field.apply (CAP pts)", stage_field, params, cpos_cap)

    @jax.jit
    def stage_sigma(params, feats):
        return renderer.sigma_decoder.apply(params["sigma"], feats)

    sigma = timeit("sigma decoder", stage_sigma, params, feats)

    dirs_cap = rays_d[jnp.where(is_pad, 0, seg)]

    @jax.jit
    def stage_rgb(params, feats, dirs):
        return renderer.rgb_decoder.apply(params["rgb"], feats, dirs)

    timeit("rgb decoder", stage_rgb, params, feats, dirs_cap)

    @jax.jit
    def stage_weights(sigma, deltas, seg, is_pad):
        from tinynerf_tpu.ops import compute_weights_packed

        valid = 1.0 - is_pad.astype(jnp.float32)
        delta_cap = deltas.reshape(-1)[jnp.where(is_pad, 0, seg * S)]
        return compute_weights_packed(sigma, delta_cap, valid, seg, 1e-4)

    timeit("packed weights (segscan)", stage_weights, sigma, deltas, seg, is_pad)

    # full fwd
    @jax.jit
    def full_fwd(params, occ_state, rays_o, rays_d):
        return renderer.render_packed(params, occ_state, rays_o, rays_d, CAP).rgb

    timeit("render_packed fwd", full_fwd, params, occ_state, rays_o, rays_d)

    # full fwd+bwd
    @jax.jit
    def full_grad(params, occ_state, rays_o, rays_d):
        def loss(p):
            out = renderer.render_packed(p, occ_state, rays_o, rays_d, CAP)
            return jnp.mean((out.rgb - rgbs) ** 2)
        return jax.grad(loss)(params)

    timeit("render_packed fwd+bwd", full_grad, params, occ_state, rays_o, rays_d, n=5)

    # reg grads
    @jax.jit
    def reg_grad(params):
        return jax.grad(lambda p: renderer.field.loss_tv(p["field"]))(params)

    timeit("TV reg grad", reg_grad, params, n=5)

    # occupancy update
    @jax.jit
    def occ_up(params, occ_state):
        return renderer.occupancy.update(
            occ_state, lambda x: renderer.sigma_fn(params, x), jax.random.PRNGKey(0)
        )

    timeit("occupancy update", occ_up, params, occ_state, n=3)


if __name__ == "__main__":
    main()
