"""Sorted-window table-gradient kernel (ops/table_grad.py): numeric equality
with the jnp scatter-add reference, and end-to-end gradient equality of the
multiscale lookup under bwd_impl="sorted" vs "scatter"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.ops.interp import bilinear_lookup_multiscale
from tinynerf_tpu.ops.table_grad import (
    sort_by_window,
    table_grad_sorted,
    windowed_accumulate_ref,
)


def _random_case(seed, p=2, n=1500, f=8, n_cells=600):
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(p, n, f)).astype(np.float32)
    w4 = rng.uniform(size=(p, n, 4)).astype(np.float32)
    cell = rng.integers(0, n_cells, size=(p, n), dtype=np.int32)
    return jnp.asarray(g), jnp.asarray(w4), jnp.asarray(cell), n_cells


def _scatter_ref_nc(g, w, cell, n_cells):
    nc = w.shape[-1]
    out = []
    for pi in range(g.shape[0]):
        contrib = jnp.concatenate(
            [w[pi, :, k : k + 1] * g[pi] for k in range(nc)], axis=1
        )
        out.append(
            jnp.zeros((n_cells, nc * g.shape[-1]), jnp.float32)
            .at[cell[pi]]
            .add(contrib)
        )
    return jnp.stack(out)


def _scatter_ref(g, w4, cell, n_cells):
    p, n, f = g.shape
    out = []
    for pi in range(p):
        contrib = jnp.concatenate(
            [w4[pi, :, k : k + 1] * g[pi] for k in range(4)], axis=1
        )
        out.append(
            jnp.zeros((n_cells, 4 * f), jnp.float32).at[cell[pi]].add(contrib)
        )
    return jnp.stack(out)


def test_sort_by_window_offsets():
    _, _, cell, n_cells = _random_case(0)
    w = 128
    n_cells_pad = -(-n_cells // w) * w
    perm, offsets = sort_by_window(cell, n_cells_pad, w)
    perm, offsets = np.asarray(perm), np.asarray(offsets)
    for pi in range(cell.shape[0]):
        c = np.asarray(cell[pi])
        assert sorted(perm[pi].tolist()) == list(range(cell.shape[1]))
        buckets = c[perm[pi]] // w
        assert (np.diff(buckets) >= 0).all()
        for wi in range(n_cells_pad // w):
            lo, hi = offsets[pi, wi], offsets[pi, wi + 1]
            assert (buckets[lo:hi] == wi).all()
        assert offsets[pi, -1] == cell.shape[1]


@pytest.mark.parametrize("seed,w_window", [(1, 128), (2, 256), (3, 256)])
def test_table_grad_sorted_matches_scatter(seed, w_window):
    """The full pipeline matches the f32 scatter to the (hi, lo) bf16-pair
    accumulation error (~2^-16 relative)."""
    g, w4, cell, n_cells = _random_case(seed)
    out = table_grad_sorted(g, w4, cell, n_cells, w_window=w_window)
    ref = _scatter_ref(g, w4, cell, n_cells)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5 * scale
    )


def test_table_grad_sorted_eight_corners():
    """3-D (oct) corner count: nc=8 rows, the cobafa layout."""
    rng = np.random.default_rng(7)
    p, n, f, n_cells = 1, 900, 4, 300
    g = jnp.asarray(rng.normal(size=(p, n, f)).astype(np.float32))
    w8 = jnp.asarray(rng.uniform(size=(p, n, 8)).astype(np.float32))
    cell = jnp.asarray(rng.integers(0, n_cells, size=(p, n), dtype=np.int32))
    out = table_grad_sorted(g, w8, cell, n_cells, w_window=64)
    ref = _scatter_ref_nc(g, w8, cell, n_cells)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5 * scale)


@pytest.mark.parametrize("seed,w_window", [(1, 128), (2, 256)])
def test_table_grad_sorted_bf16_payload(seed, w_window):
    """The bf16 payload quantizes ONLY the cotangent g (~2^-8 relative);
    weights ride as an exact (hi, lo) pair and the cell as the exact
    within-window offset — so the result matches the f32 scatter to g's
    quantization error, not worse."""
    g, w4, cell, n_cells = _random_case(seed)
    out = table_grad_sorted(
        g, w4, cell, n_cells, w_window=w_window, payload_dtype=jnp.bfloat16
    )
    ref = _scatter_ref(g, w4, cell, n_cells)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=6e-3 * scale
    )
    # and it is exactly the scatter of bf16-quantized g (weights exact)
    ref_q = _scatter_ref(g.astype(jnp.bfloat16).astype(jnp.float32), w4, cell, n_cells)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_q), atol=3e-5 * scale
    )


def test_multiscale_lookup_sorted_bf16_grads_close():
    """End to end: bwd_impl='sorted_bf16' grads match the scatter backward
    to the g-quantization error class."""
    key = jax.random.PRNGKey(4)
    tables = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (r, r, 4))
        for i, r in enumerate((9, 17, 33))
    )
    coords = jax.random.uniform(jax.random.PRNGKey(9), (400, 2), minval=-1, maxval=1)
    cot = jax.random.normal(jax.random.PRNGKey(5), (400, 12))

    def run(impl):
        def f(ts):
            out = bilinear_lookup_multiscale(ts, coords, jnp.float32, impl)
            return jnp.sum(out * cot)

        return jax.grad(f)(tables)

    g_scatter = run("scatter")
    g_bf16 = run("sorted_bf16")
    for a, b in zip(g_scatter, g_bf16):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=8e-3 * scale
        )


def test_windowed_accumulate_empty_and_skewed_windows():
    """Windows with zero samples and one window holding everything."""
    p, n, f = 1, 700, 4
    n_cells, w = 256, 64
    rng = np.random.default_rng(4)
    g = jnp.asarray(rng.normal(size=(p, n, f)).astype(np.float32))
    w4 = jnp.asarray(rng.uniform(size=(p, n, 4)).astype(np.float32))
    cell = jnp.asarray(np.full((p, n), 130, np.int32))  # all in window 2
    out = table_grad_sorted(g, w4, cell, n_cells, w_window=w)
    ref = _scatter_ref(g, w4, cell, n_cells)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5 * scale)


def test_multiscale_lookup_sorted_grads_match_scatter():
    """End to end: d/dtables of the fused multiscale lookup is the same under
    the sorted-window backward and the XLA scatter backward."""
    key = jax.random.PRNGKey(0)
    tables = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (r, r, 4))
        for i, r in enumerate((9, 17, 33))
    )
    coords = jax.random.uniform(jax.random.PRNGKey(9), (400, 2), minval=-1, maxval=1)
    cot = jax.random.normal(jax.random.PRNGKey(5), (400, 12))

    def run(impl):
        def f(ts):
            out = bilinear_lookup_multiscale(ts, coords, jnp.float32, impl)
            return jnp.sum(out * cot)

        return jax.grad(f)(tables)

    g_scatter = run("scatter")
    g_sorted = run("sorted")
    for a, b in zip(g_scatter, g_sorted):
        # only the (hi, lo) bf16-pair accumulation error differs (~2^-16)
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4 * scale
        )


def test_multiscale_fusedfine_fwd_matches_perscale():
    """At f32 gather dtype the fused-fine forward must match the per-scale
    forward (exact-upsampling property); grads are identical by
    construction (shared backward)."""
    key = jax.random.PRNGKey(1)
    tables = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (r, r, 4))
        for i, r in enumerate((9, 17, 33))
    )
    coords = jax.random.uniform(jax.random.PRNGKey(2), (300, 2), minval=-1, maxval=1)
    a = bilinear_lookup_multiscale(tables, coords, jnp.float32, "scatter", "perscale")
    b = bilinear_lookup_multiscale(tables, coords, jnp.float32, "scatter", "fusedfine")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_multiproj_matches_per_projection():
    """multiscale_lookup_multiproj values and table grads == three
    independent bilinear_lookup_multiscale calls."""
    from tinynerf_tpu.ops.interp import multiscale_lookup_multiproj

    key = jax.random.PRNGKey(3)
    tables_by_proj = tuple(
        tuple(
            jax.random.normal(jax.random.fold_in(key, 10 * p + i), (r, r, 4))
            for i, r in enumerate((9, 17, 33))
        )
        for p in range(3)
    )
    coords_by_proj = tuple(
        jax.random.uniform(
            jax.random.PRNGKey(20 + p), (256, 2), minval=-1, maxval=1
        )
        for p in range(3)
    )
    cot = tuple(
        jax.random.normal(jax.random.PRNGKey(30 + p), (256, 12))
        for p in range(3)
    )

    def f_multi(ts):
        outs = multiscale_lookup_multiproj(
            ts, coords_by_proj, jnp.float32, "sorted"
        )
        return sum(jnp.sum(o * c) for o, c in zip(outs, cot))

    def f_single(ts):
        outs = [
            bilinear_lookup_multiscale(t, c, jnp.float32, "scatter")
            for t, c in zip(ts, coords_by_proj)
        ]
        return sum(jnp.sum(o * c) for o, c in zip(outs, cot))

    v_m, g_m = jax.value_and_grad(f_multi)(tables_by_proj)
    v_s, g_s = jax.value_and_grad(f_single)(tables_by_proj)
    np.testing.assert_allclose(float(v_m), float(v_s), rtol=1e-6)
    for gm_p, gs_p in zip(g_m, g_s):
        for a, b in zip(gm_p, gs_p):
            scale = float(jnp.abs(b).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4 * scale
            )


@pytest.mark.slow
def test_multiproj_sharded_pullback_partials_sum_to_full():
    """shard_axis grads (ops/interp.py _sharded_pullback): inside shard_map
    each device returns a row-band PARTIAL of every master-table gradient;
    their psum must equal the unsharded full-batch gradient — the contract
    the shard_bwd train step (train/loop.py) relies on.  Slow tier: the
    8-device shard_map grad compile is ~2 min on CPU, and the fast tier
    keeps end-to-end shard_bwd equality via test_zero's zero_bwd variant."""
    from functools import partial as fpartial

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from tinynerf_tpu.ops.interp import multiscale_lookup_multiproj
    from tinynerf_tpu.parallel import DATA_AXIS, make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(jax.devices()[:8])

    key = jax.random.PRNGKey(4)
    tables_by_proj = tuple(
        tuple(
            jax.random.normal(jax.random.fold_in(key, 10 * p + i), (r, r, 4))
            for i, r in enumerate((9, 17, 33))
        )
        for p in range(3)
    )
    n = 512
    coords_by_proj = tuple(
        jax.random.uniform(
            jax.random.PRNGKey(40 + p), (n, 2), minval=-1, maxval=1
        )
        for p in range(3)
    )
    cot = tuple(
        jax.random.normal(jax.random.PRNGKey(50 + p), (n, 12))
        for p in range(3)
    )

    def loss(ts, coords, cs, shard_axis):
        outs = multiscale_lookup_multiproj(
            ts, coords, jnp.float32, "scatter", "perscale", shard_axis
        )
        return sum(jnp.sum(o * c) for o, c in zip(outs, cs))

    g_ref = jax.grad(loss)(tables_by_proj, coords_by_proj, cot, None)

    @fpartial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    def sharded_grads(ts, coords, cs):
        g = jax.grad(
            lambda t: loss(t, coords, cs, (DATA_AXIS, 8))
        )(ts)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DATA_AXIS), g
        )

    g_sh = sharded_grads(tables_by_proj, coords_by_proj, cot)
    for gp_ref, gp_sh in zip(g_ref, g_sh):
        for a, b in zip(gp_ref, gp_sh):
            scale = float(jnp.abs(a).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4 * scale
            )
