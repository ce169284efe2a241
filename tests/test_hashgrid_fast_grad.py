"""The custom-VJP hash-grid fast path (MXU one-hot-matmul table gradient)
must match the autodiff path: forward exactly, gradients within bf16
accumulation tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_fast,
    hashgrid_init,
)

SPEC = HashGridSpec(
    n_levels=6, log2_hashmap_size=14, base_resolution=4, per_level_scale=1.5
)


def _setup():
    table = hashgrid_init(jax.random.PRNGKey(0), SPEC) * 1000.0
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (512, 3), minval=0.01, maxval=0.99
    )
    return table, x


def test_forward_identical():
    table, x = _setup()
    a = hashgrid_encode(table, x, SPEC)
    f = hashgrid_encode_fast(table, x, SPEC)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(f))


def test_gradients_match():
    table, x = _setup()

    def la(t, xx):
        return (hashgrid_encode(t, xx, SPEC) ** 2).sum()

    def lf(t, xx):
        return (hashgrid_encode_fast(t, xx, SPEC) ** 2).sum()

    ga_t, ga_x = jax.grad(la, argnums=(0, 1))(table, x)
    gf_t, gf_x = jax.grad(lf, argnums=(0, 1))(table, x)
    scale_t = np.abs(np.asarray(ga_t)).max()
    # table grad through bf16 matmul: ~1e-3 relative
    assert np.abs(np.asarray(ga_t) - np.asarray(gf_t)).max() < 3e-3 * scale_t
    # position grad is computed in fp32: tight
    np.testing.assert_allclose(
        np.asarray(ga_x), np.asarray(gf_x), rtol=1e-4, atol=1e-5
    )


def test_gradients_match_with_level_mask():
    table, x = _setup()
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.5, 0.0, 0.0])

    def la(t):
        return (hashgrid_encode(t, x, SPEC, mask) ** 2).sum()

    def lf(t):
        return (hashgrid_encode_fast(t, x, SPEC, mask) ** 2).sum()

    ga = jax.grad(la)(table)
    gf = jax.grad(lf)(table)
    scale = np.abs(np.asarray(ga)).max()
    assert np.abs(np.asarray(ga) - np.asarray(gf)).max() < 3e-3 * scale


def test_gradients_match_sort_path(monkeypatch):
    """Force the sort-based (two-sort segment sum) table gradient used for
    the big hashed levels and check parity against autodiff — this path is
    exact (fp32 sorts + cumsum), so tolerance is tight."""
    import instant_nsr_pl_tpu.ops.hashgrid as hg

    monkeypatch.setattr(hg, "_SORT_GRAD_MIN_SIZE", 0)
    table, x = _setup()

    def la(t, xx):
        return (hashgrid_encode(t, xx, SPEC) ** 2).sum()

    def lf(t, xx):
        return (hashgrid_encode_fast(t, xx, SPEC) ** 2).sum()

    ga_t, ga_x = jax.grad(la, argnums=(0, 1))(table, x)
    gf_t, gf_x = jax.grad(lf, argnums=(0, 1))(table, x)
    # fp32 cumsum over sorted runs: small associativity error only
    scale_t = np.abs(np.asarray(ga_t)).max()
    assert np.abs(np.asarray(ga_t) - np.asarray(gf_t)).max() < 1e-4 * scale_t
    np.testing.assert_allclose(
        np.asarray(ga_x), np.asarray(gf_x), rtol=1e-4, atol=1e-5
    )


def test_strided_dilated_lookup_is_superset():
    """Strided probing against the dilated grid must never prune a sample
    that per-sample probing keeps (conservativeness)."""
    from instant_nsr_pl_tpu.ops.marching import (
        OccGridSpec,
        _dilate_binary,
        march_rays,
    )
    from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect

    key = jax.random.PRNGKey(0)
    spec = OccGridSpec(resolution=32, radius=1.0)
    binary = jax.random.bernoulli(key, 0.2, (32**3,))
    dilated = _dilate_binary(binary, 32)

    rays_o = jnp.zeros((16, 3)).at[:, 2].set(-2.5)
    d = jax.random.normal(key, (16, 3)) * 0.15 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0, t1 = ray_aabb_intersect(rays_o, rays_d, -1.0, 1.0)

    kw = dict(render_step_size=0.015, max_samples=256, capacity=4096,
              occ_spec=spec)
    exact = march_rays(rays_o, rays_d, t0, t1, occ_binary=binary, **kw)
    strided = march_rays(
        rays_o, rays_d, t0, t1, occ_binary=binary,
        occ_dilated=dilated, occ_stride=4, **kw,
    )
    # every (ray, t_start) kept by the exact lookup appears in the strided set
    def keys(s):
        return {
            (int(r), round(float(t), 5))
            for r, t, v in zip(
                np.asarray(s.ray_indices), np.asarray(s.t_starts), np.asarray(s.valid)
            )
            if v
        }

    assert keys(exact) <= keys(strided)


# ---------------------------------------------------------------------------
# per-group tap dedup (spec.dedup_group / dedup_step): block-structured
# inputs go through the 27-point lattice path on coarse levels — must match
# the per-sample path on values and gradients
# ---------------------------------------------------------------------------

import dataclasses


def _block_setup(g=8, nblocks=64, step=0.01):
    """Positions as uniform-step runs (one per aligned g-block), the layout
    the group-compacted march guarantees. step=0.01 makes the dedup level
    split mixed for SPEC: levels 0-2 dedup at g=8, 3-4 at g=4, 5 per-sample.
    """
    spec = dataclasses.replace(SPEC, dedup_group=g, dedup_step=step)
    table = hashgrid_init(jax.random.PRNGKey(0), spec) * 1000.0
    x0 = jax.random.uniform(
        jax.random.PRNGKey(2), (nblocks, 3), minval=0.02, maxval=0.98
    )
    d = jax.random.normal(jax.random.PRNGKey(3), (nblocks, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    i = jnp.arange(g, dtype=jnp.float32)[None, :, None]
    x = jnp.clip(x0[:, None] + d[:, None] * (i * step), 0.0, 1.0)
    return spec, table, x.reshape(-1, 3)


def test_dedup_level_split_is_mixed():
    spec, _, _ = _block_setup()
    gs = spec.dedup_group_sizes
    assert any(v == 8 for v in gs) and any(v == 4 for v in gs)
    assert gs[-1] == 0, gs  # finest level stays per-sample


def test_dedup_forward_matches_per_sample():
    spec, table, x = _block_setup()
    ref = hashgrid_encode(table, x, SPEC)  # per-sample, autodiff path
    got = hashgrid_encode_fast(table, x, spec)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-6
    )


def test_dedup_gradients_match():
    spec, table, x = _block_setup()

    def la(t, xx):
        return (hashgrid_encode(t, xx, SPEC) ** 2).sum()

    def lf(t, xx):
        return (hashgrid_encode_fast(t, xx, spec) ** 2).sum()

    ga_t, ga_x = jax.grad(la, argnums=(0, 1))(table, x)
    gf_t, gf_x = jax.grad(lf, argnums=(0, 1))(table, x)
    scale_t = np.abs(np.asarray(ga_t)).max()
    assert np.abs(np.asarray(ga_t) - np.asarray(gf_t)).max() < 3e-3 * scale_t
    np.testing.assert_allclose(
        np.asarray(ga_x), np.asarray(gf_x), rtol=2e-4, atol=2e-5
    )


def test_dedup_gradients_match_level_mask():
    spec, table, x = _block_setup()
    mask = jnp.asarray([1.0, 1.0, 0.5, 1.0, 0.0, 1.0])

    def la(t):
        return (hashgrid_encode(t, x, SPEC, mask) ** 2).sum()

    def lf(t):
        return (hashgrid_encode_fast(t, x, spec, mask) ** 2).sum()

    ga = jax.grad(la)(table)
    gf = jax.grad(lf)(table)
    scale = np.abs(np.asarray(ga)).max()
    assert np.abs(np.asarray(ga) - np.asarray(gf)).max() < 3e-3 * scale


def test_dedup_identical_padding_block():
    """Fully-dead padding blocks are all-identical positions (the march
    zeroes whole blocks only); the lattice path must not NaN or misindex."""
    spec, table, x = _block_setup()
    x = x.at[:8].set(x[0])  # first block: 8 identical points
    got = hashgrid_encode_fast(table, x, spec)
    ref = hashgrid_encode(table, x, SPEC)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-6
    )
    g = jax.grad(lambda t: (hashgrid_encode_fast(t, x, spec) ** 2).sum())(
        table
    )
    assert np.isfinite(np.asarray(g)).all()
