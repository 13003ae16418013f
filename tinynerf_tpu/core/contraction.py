"""Scene contractions: map world coordinates into the unit cube [-1,1]^3.

Parity: ContractionMip360 / ContractionAABB (reference src/core.py:11-33).
Pure jnp, trivially jittable; each returns (coords, valid_mask) where the
Mip-360 contraction is total (mask all-true) and the AABB contraction flags
points outside the box.  Masks are float32 (1.0 = valid) so they compose
directly with the weights op.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ContractionMip360:
    """Mip-NeRF-360 contraction (arXiv 2111.12077) with configurable p-norm.

    x                      if ||x|| <= 1
    (2 - 1/||x||) x/||x||  otherwise
    then divided by 2 so everything lands in [-1, 1]^3 (for order=inf).
    Default order is inf, matching the reference's train() wiring.
    """

    order: float = float("inf")

    def __call__(self, coords: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self.order == float("inf"):
            norm = jnp.max(jnp.abs(coords), axis=-1, keepdims=True)
        else:
            norm = jnp.linalg.norm(coords, ord=self.order, axis=-1, keepdims=True)
        safe = jnp.maximum(norm, 1e-12)
        contracted = jnp.where(norm <= 1.0, coords, (2.0 - 1.0 / safe) * coords / safe)
        contracted = contracted / 2.0
        mask = jnp.ones(coords.shape[:-1], dtype=jnp.float32)
        return contracted, mask


@dataclass(frozen=True)
class ContractionAABB:
    """Affine map of an axis-aligned box to [-1,1]^3 + inside-the-box mask.

    `aabb` is a (2,3) tuple-of-tuples (static, hashable) of (min, max) corners.
    """

    aabb: Tuple[Tuple[float, float, float], Tuple[float, float, float]]

    def __call__(self, coords: jax.Array) -> Tuple[jax.Array, jax.Array]:
        lo = jnp.array(self.aabb[0], dtype=coords.dtype)
        hi = jnp.array(self.aabb[1], dtype=coords.dtype)
        mask = jnp.all((coords >= lo) & (coords <= hi), axis=-1).astype(jnp.float32)
        contracted = (coords - lo) / (hi - lo) * 2.0 - 1.0
        return contracted, mask
