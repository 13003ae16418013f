"""Pallas weights kernel vs the jnp semantic reference (interpret mode in CI;
the same kernel compiles via Mosaic on TPU).  This is the numeric safety net
the reference never had for its CUDA kernel (SURVEY.md §5, race detection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.ops import compute_weights
from tinynerf_tpu.ops.weights_pallas import _cumsum_lanes, compute_weights_pallas


@pytest.fixture
def batch():
    rng = np.random.default_rng(11)
    R, S = 48, 100
    sig = jnp.asarray(rng.uniform(0, 8, (R, S)).astype(np.float32))
    dlt = jnp.asarray(rng.uniform(0.01, 0.1, (R, S)).astype(np.float32))
    msk = jnp.asarray((rng.uniform(size=(R, S)) > 0.3).astype(np.float32))
    return sig, dlt, msk


def test_cumsum_lanes():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 37)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_cumsum_lanes(x)), np.cumsum(np.asarray(x), -1), atol=1e-5
    )


def test_pallas_fwd_matches_jnp(batch):
    sig, dlt, msk = batch
    for thr in (0.0, 1e-4, 1e-2):
        w_ref = compute_weights(sig, dlt, msk, thr)
        w_pl = compute_weights_pallas(sig, dlt, msk, thr, interpret=True)
        np.testing.assert_allclose(np.asarray(w_pl), np.asarray(w_ref), atol=1e-6)


def test_pallas_bwd_matches_jnp(batch):
    sig, dlt, msk = batch
    g = jnp.asarray(
        np.random.default_rng(5).normal(size=sig.shape).astype(np.float32)
    )

    def loss_ref(s):
        return jnp.sum(compute_weights(s, dlt, msk, 1e-4) * g)

    def loss_pl(s):
        return jnp.sum(compute_weights_pallas(s, dlt, msk, 1e-4, True) * g)

    g_ref = jax.grad(loss_ref)(sig)
    g_pl = jax.grad(loss_pl)(sig)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-5)


def test_pallas_multiblock(batch):
    """Rows spanning several grid blocks (ROWS_PER_BLOCK boundary)."""
    rng = np.random.default_rng(2)
    R, S = 600, 64  # > 2 blocks of 256
    sig = jnp.asarray(rng.uniform(0, 4, (R, S)).astype(np.float32))
    dlt = jnp.asarray(np.full((R, S), 0.05, np.float32))
    msk = jnp.ones((R, S), jnp.float32)
    w_ref = compute_weights(sig, dlt, msk, 1e-4)
    w_pl = compute_weights_pallas(sig, dlt, msk, 1e-4, True)
    np.testing.assert_allclose(np.asarray(w_pl), np.asarray(w_ref), atol=1e-6)
