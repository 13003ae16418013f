"""In-VMEM bitonic sort kernel (ops/bitonic.py): semantic equality with
jnp.sort, plus the packed-key partition contract the table-gradient pipeline
rides on.  Runs in interpret mode on CPU (the kernel pattern rule of
CLAUDE.md: every Pallas kernel is tested against a jnp reference)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tinynerf_tpu.ops.bitonic import (
    pack_keys,
    packed_bits_ok,
    sort_i32,
    unpack_keys,
)


@pytest.mark.parametrize("n", [1, 7, 255, 256, 1000, 4096, 5000])
def test_sort_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-(2**31), 2**31 - 1, size=n, dtype=np.int32)
    np.testing.assert_array_equal(np.asarray(sort_i32(jnp.asarray(x))), np.sort(x))


def test_sort_batched():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**30, size=(5, 2048), dtype=np.int32)
    np.testing.assert_array_equal(
        np.asarray(sort_i32(jnp.asarray(x))), np.sort(x, axis=-1)
    )


def test_sort_adversarial_orders():
    for n in (512, 1024):
        for arr in (
            np.arange(n, dtype=np.int32),
            np.arange(n, dtype=np.int32)[::-1].copy(),
            np.zeros(n, np.int32),
            np.tile(np.array([3, 1, 2], np.int32), n)[:n],
        ):
            np.testing.assert_array_equal(
                np.asarray(sort_i32(jnp.asarray(arr))), np.sort(arr)
            )


def test_packed_key_partition_contract():
    """Sorting pack_keys(bucket) groups samples by bucket and yields a valid
    gather permutation — the exact property sort_by_window needs."""
    rng = np.random.default_rng(2)
    n, n_buckets = 3000, 64
    b = rng.integers(0, n_buckets, size=n, dtype=np.int32)
    idx_bits = 12
    assert packed_bits_ok(n_buckets, n)
    s = sort_i32(pack_keys(jnp.asarray(b), idx_bits))
    sb, perm = (np.asarray(a) for a in unpack_keys(s, idx_bits))
    assert (np.diff(sb) >= 0).all()
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_array_equal(b[perm], sb)
