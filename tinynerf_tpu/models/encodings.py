"""Input encodings: NeRF positional (frequency) encoding.

Parity: reference PositionalEncoding (src/models.py:30-39) — frequencies
2^k * pi for k in [0, n_freqs), concat(sin, cos) per coordinate, flattened so
the layout per input coordinate is [sin(f0 x)..sin(fK x), cos(f0 x)..cos(fK x)].
Output dim = in_dim * 2 * n_freqs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(x: jax.Array, n_freqs: int) -> jax.Array:
    """x: [..., d] -> [..., d * 2 * n_freqs]."""
    freqs = jnp.asarray(
        (2.0 ** np.arange(n_freqs)) * np.pi, dtype=x.dtype
    )
    xf = x[..., None] * freqs  # [..., d, n_freqs]
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # [..., d, 2K]
    return enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_freqs)


def posenc_dim(in_dim: int, n_freqs: int) -> int:
    return in_dim * 2 * n_freqs
