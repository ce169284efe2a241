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
