"""Packed segmented-scan kernel: numeric contract vs the dense weights op
(itself property-tested against a per-ray loop in test_weights.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.ops import (
    compute_weights,
    compute_weights_packed,
    segmented_cumsum,
)


def test_segmented_cumsum_forward_and_reverse():
    rng = np.random.default_rng(0)
    x = rng.normal(size=150).astype(np.float32)
    # irregular segment lengths incl. length-1 and cross-row (>128) spans
    lengths = [1, 7, 130, 5, 7]
    seg = np.concatenate([np.full(n, i) for i, n in enumerate(lengths)]).astype(np.int32)

    fwd = np.asarray(segmented_cumsum(jnp.asarray(x), jnp.asarray(seg)))
    rev = np.asarray(segmented_cumsum(jnp.asarray(x), jnp.asarray(seg), reverse=True))
    start = 0
    for n in lengths:
        sl = slice(start, start + n)
        np.testing.assert_allclose(fwd[sl], np.cumsum(x[sl]), atol=1e-5)
        np.testing.assert_allclose(rev[sl], np.cumsum(x[sl][::-1])[::-1], atol=1e-5)
        start += n


def test_segmented_cumsum_multiblock():
    """Segments crossing the 8192-sample grid-block boundary carry correctly."""
    rng = np.random.default_rng(1)
    n = 3 * 8192 + 1000
    x = rng.uniform(0, 1, n).astype(np.float32)
    # one segment per 300 samples -> many block crossings
    seg = (np.arange(n) // 300).astype(np.int32)
    out = np.asarray(segmented_cumsum(jnp.asarray(x), jnp.asarray(seg)))
    for s in range(0, n // 300 + 1):
        sl = slice(s * 300, min((s + 1) * 300, n))
        np.testing.assert_allclose(out[sl], np.cumsum(x[sl]), rtol=1e-5, atol=1e-4)


@pytest.fixture
def packed_problem():
    rng = np.random.default_rng(42)
    R, S = 24, 50
    sig = rng.uniform(0, 8, (R, S)).astype(np.float32)
    dlt = rng.uniform(0.01, 0.1, (R, S)).astype(np.float32)
    msk = rng.uniform(size=(R, S)) > 0.35
    msk[3] = False  # empty ray
    idx = np.nonzero(msk.reshape(-1))[0]
    cap = len(idx) + 13
    sig_c = np.zeros(cap, np.float32)
    dlt_c = np.ones(cap, np.float32)
    val_c = np.zeros(cap, np.float32)
    seg_c = np.full(cap, R, np.int32)
    sig_c[: len(idx)] = sig.reshape(-1)[idx]
    dlt_c[: len(idx)] = dlt.reshape(-1)[idx]
    val_c[: len(idx)] = 1.0
    seg_c[: len(idx)] = idx // S
    return (sig, dlt, msk), (sig_c, dlt_c, val_c, seg_c), idx


def test_packed_weights_match_dense(packed_problem):
    (sig, dlt, msk), (sig_c, dlt_c, val_c, seg_c), idx = packed_problem
    for thr in (0.0, 1e-4, 1e-2):
        w_dense = np.asarray(
            compute_weights(
                jnp.asarray(sig), jnp.asarray(dlt), jnp.asarray(msk, jnp.float32), thr
            )
        )
        w_packed = np.asarray(
            compute_weights_packed(
                jnp.asarray(sig_c), jnp.asarray(dlt_c), jnp.asarray(val_c),
                jnp.asarray(seg_c), thr,
            )
        )
        np.testing.assert_allclose(
            w_packed[: len(idx)], w_dense.reshape(-1)[idx], atol=1e-6
        )
        assert np.all(w_packed[len(idx):] == 0.0)


def test_packed_weights_grads_match_dense(packed_problem):
    (sig, dlt, msk), (sig_c, dlt_c, val_c, seg_c), idx = packed_problem
    rng = np.random.default_rng(7)
    g_c = rng.normal(size=len(sig_c)).astype(np.float32)
    g_dense = np.zeros(sig.size, np.float32)
    g_dense[idx] = g_c[: len(idx)]
    g_dense = g_dense.reshape(sig.shape)

    grad_dense = np.asarray(
        jax.grad(
            lambda s: jnp.sum(
                compute_weights(
                    s, jnp.asarray(dlt), jnp.asarray(msk, jnp.float32), 1e-4
                )
                * jnp.asarray(g_dense)
            )
        )(jnp.asarray(sig))
    )
    grad_packed = np.asarray(
        jax.grad(
            lambda s: jnp.sum(
                compute_weights_packed(
                    s, jnp.asarray(dlt_c), jnp.asarray(val_c), jnp.asarray(seg_c), 1e-4
                )
                * jnp.asarray(g_c)
            )
        )(jnp.asarray(sig_c))
    )
    np.testing.assert_allclose(
        grad_packed[: len(idx)], grad_dense.reshape(-1)[idx], atol=1e-5
    )
