"""Ray marchers: per-ray sample distances t and step sizes delta.

Parity: RayMarcherUnbounded / RayMarcherAABB (reference src/core.py:36-90).
Both are pure jnp with static shapes [n_rays, n_samples].

Unbounded: disparity-style spacing f(x) = 2x if x<0.5 else 1/(2-2x) over a
fixed grid, scaled by the scene scale — the t grid is RAY-INDEPENDENT, so it
is computed once as a constant and broadcast (the XLA compiler hoists it out
of the train step entirely).

AABB: slab-test ray/box intersection for the entry distance t_min, then
n_samples uniform steps of ||aabb diagonal|| / n_samples.  Like the reference,
the exit distance is not used — samples past the box are culled downstream by
the contraction mask (reference quirk, SURVEY.md §2 #9; kept because culling
makes it semantically equivalent and it saves a clamp).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RayMarcherUnbounded:
    n_samples: int = 200
    near: float = 0.0
    far: float = 1e5
    uniform_range: float = 1.0

    @property
    def step_size(self) -> float:
        """Representative step (used by the occupancy grid update)."""
        return self.uniform_range / self.n_samples

    @property
    def step_x(self) -> float:
        """Spacing of the disparity parameter x (x_k = k * step_x)."""
        return (1.0 - 1.0 / (self.n_samples + 2)) / self.n_samples

    def _grid(self) -> Tuple[np.ndarray, np.ndarray]:
        # computed k * step_x (not linspace) so the skip marcher's closed-form
        # per-sample evaluation of the same f32 expression is bitwise equal
        x = (
            np.arange(self.n_samples + 1, dtype=np.float32)
            * np.float32(self.step_x)
        )
        f = np.where(x < 0.5, 2.0 * x, 1.0 / (2.0 - 2.0 * x)).astype(np.float32)
        t = f * np.float32(self.uniform_range) + np.float32(self.near)
        deltas = t[1:] - t[:-1]
        return t[:-1], deltas

    def __call__(self, rays_o: jax.Array, rays_d: jax.Array) -> Tuple[jax.Array, jax.Array]:
        n_rays = rays_o.shape[0]
        t, deltas = self._grid()
        t_values = jnp.broadcast_to(jnp.asarray(t), (n_rays, self.n_samples))
        step_sizes = jnp.broadcast_to(jnp.asarray(deltas), (n_rays, self.n_samples))
        return t_values, step_sizes


@dataclass(frozen=True)
class RayMarcherAABB:
    aabb: Tuple[Tuple[float, float, float], Tuple[float, float, float]]
    n_samples: int = 200
    near: float = 0.0
    far: float = 1e5

    @property
    def step_size(self) -> float:
        lo = np.array(self.aabb[0], dtype=np.float32)
        hi = np.array(self.aabb[1], dtype=np.float32)
        return float(np.linalg.norm(hi - lo) / self.n_samples)

    def entry_exit(self, rays_o: jax.Array, rays_d: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Slab-test entry/exit distances: (t_min clamped to [near, far],
        t_exit).  The dense path only consumes t_min (out-of-box samples are
        culled by the contraction mask); the skip marcher also uses t_exit to
        terminate rays at the box boundary."""
        eps = 1e-9
        box = jnp.array(self.aabb, dtype=rays_o.dtype)  # [2, 3]

        # distances to the two planes per axis; nearer plane per axis ->
        # farthest of those = entry; farther plane per axis -> nearest = exit
        d_safe = jnp.where(rays_d == 0.0, rays_d + eps, rays_d)
        t_planes = (box[:, None, :] - rays_o[None]) / d_safe[None]  # [2, R, 3]
        t_min = jnp.max(jnp.min(t_planes, axis=0), axis=-1)  # [R]
        t_exit = jnp.min(jnp.max(t_planes, axis=0), axis=-1)  # [R]
        t_min = jnp.clip(t_min, self.near, self.far)
        # nudge the first sample strictly inside the box: at t_min exactly the
        # position sits ON the box surface, and the in-box test of that
        # knife-edge point resolves differently between differently-fused
        # kernels (1-ulp fma differences) — 1e-4 steps is quality-invisible
        # and makes the dense and skip marching paths deterministic and equal
        t_min = t_min + jnp.float32(1e-4 * self.step_size)
        return t_min, t_exit

    def __call__(self, rays_o: jax.Array, rays_d: jax.Array) -> Tuple[jax.Array, jax.Array]:
        t_min, _ = self.entry_exit(rays_o, rays_d)
        step = jnp.float32(self.step_size)
        steps = jnp.arange(self.n_samples, dtype=rays_o.dtype) * step
        t_values = t_min[:, None] + steps[None, :]
        step_sizes = jnp.full_like(t_values, step)
        return t_values, step_sizes
