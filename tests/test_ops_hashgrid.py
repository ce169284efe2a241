"""Hash-grid encoding: layout, forward vs a naive per-point reference,
autodiff gradients (first and second order)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_init,
    _PRIMES,
)

SMALL = HashGridSpec(
    n_levels=4,
    n_features_per_level=2,
    log2_hashmap_size=8,
    base_resolution=4,
    per_level_scale=2.0,
)


def test_spec_layout_matches_tcnn_rules():
    spec = HashGridSpec()  # nerf-blender defaults
    # level 0: scale = 16 - 1 = 15, res = 16
    assert spec.resolutions[0] == 16
    assert spec.scales[0] == 15.0
    # growth: scale_l = b^l * 16 - 1
    for l, s in enumerate(spec.scales):
        assert abs(s - (spec.per_level_scale**l * 16 - 1)) < 1e-6 * (s + 1)
    # dense until res^3 > 2^19 (res > 80): levels up to res 64 are dense
    for l, r in enumerate(spec.resolutions):
        if r**3 <= spec.table_size:
            assert not spec.level_hashed[l]
            assert spec.level_sizes[l] == -(-(r**3) // 8) * 8
        else:
            assert spec.level_hashed[l]
            assert spec.level_sizes[l] == spec.table_size
    assert spec.level_offsets[0] == 0
    assert spec.total_params == sum(spec.level_sizes)


def _naive_encode(params, x, spec):
    """Straightforward per-point, per-level reference implementation."""
    params = np.asarray(params)
    x = np.asarray(x)
    N = x.shape[0]
    out = np.zeros((N, spec.n_levels, spec.n_features_per_level), np.float32)
    for n in range(N):
        for l in range(spec.n_levels):
            scale = spec.scales[l]
            res = spec.resolutions[l]
            pos = x[n] * scale + 0.5
            grid = np.floor(pos).astype(np.int64)
            frac = pos - grid
            acc = np.zeros(spec.n_features_per_level, np.float32)
            for c in range(8):
                off = np.array([c & 1, (c >> 1) & 1, (c >> 2) & 1])
                corner = np.clip(grid + off, 0, res - 1).astype(np.uint32)
                if spec.level_hashed[l]:
                    h = np.uint32(0)
                    for d in range(3):
                        h ^= corner[d] * np.uint32(_PRIMES[d])
                    idx = int(h % np.uint32(spec.level_sizes[l]))
                else:
                    idx = int(corner[0] + corner[1] * res + corner[2] * res * res)
                w = np.prod(np.where(off == 1, frac, 1 - frac))
                acc += w * params[:, spec.level_offsets[l] + idx]
            out[n, l] = acc
    return out.reshape(N, -1)


def test_forward_matches_naive():
    key = jax.random.PRNGKey(0)
    params = hashgrid_init(key, SMALL)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    got = np.asarray(hashgrid_encode(params, x, SMALL))
    want = _naive_encode(params, x, SMALL)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_forward_matches_naive_hashed_levels():
    # make sure some levels actually hash
    spec = HashGridSpec(
        n_levels=3, n_features_per_level=2, log2_hashmap_size=6,
        base_resolution=4, per_level_scale=2.0,
    )
    assert any(spec.level_hashed)
    params = hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    np.testing.assert_allclose(
        np.asarray(hashgrid_encode(params, x, spec)),
        _naive_encode(params, x, spec),
        rtol=1e-5,
        atol=1e-8,
    )


def test_param_grad_scatter_add():
    """Backward w.r.t. the table is a scatter-add of weights; check against
    finite differences on a few entries."""
    spec = SMALL
    params = hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    cotangent = jax.random.normal(jax.random.PRNGKey(2), (8, spec.n_output_dims))

    def f(p):
        return (hashgrid_encode(p, x, spec) * cotangent).sum()

    g = jax.grad(f)(params)
    eps = 1e-3
    rng = np.random.default_rng(0)
    nz = np.argwhere(np.asarray(g) != 0)
    for i in rng.choice(len(nz), size=5, replace=False):
        r, c = nz[i]
        p_plus = params.at[r, c].add(eps)
        p_minus = params.at[r, c].add(-eps)
        fd = (f(p_plus) - f(p_minus)) / (2 * eps)
        np.testing.assert_allclose(g[r, c], fd, rtol=1e-2, atol=1e-5)


def test_input_grad_piecewise_linear():
    """d(encode)/dx inside a cell equals the finite-difference slope."""
    spec = SMALL
    params = hashgrid_init(jax.random.PRNGKey(0), spec) * 1e3  # bigger signal
    x = jnp.array([[0.312, 0.521, 0.774]])

    def f(pt):
        return hashgrid_encode(params, pt[None], spec).sum()

    g = jax.grad(f)(x[0])
    eps = 1e-4
    for d in range(3):
        xp = x[0].at[d].add(eps)
        xm = x[0].at[d].add(-eps)
        fd = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(g[d], fd, rtol=1e-2, atol=1e-4)


def test_second_order_through_input_grad():
    """The eikonal path: differentiate (w.r.t. params) a function of the
    input-gradient. Must produce finite, correct values."""
    spec = SMALL
    params = hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jnp.array([[0.3, 0.5, 0.7], [0.61, 0.22, 0.48]])

    def sdf(p, pt):
        return hashgrid_encode(p, pt[None], spec)[0].sum()

    def eikonal(p):
        grads = jax.vmap(lambda pt: jax.grad(sdf, argnums=1)(p, pt))(x)
        return ((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2).mean()

    val = eikonal(params)
    g = jax.grad(eikonal)(params)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    # finite-difference check on one nonzero entry
    nz = np.argwhere(np.asarray(g) != 0)
    r, c = nz[0]
    eps = 1e-4
    fd = (eikonal(params.at[r, c].add(eps)) - eikonal(params.at[r, c].add(-eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(g[r, c], fd, rtol=5e-2, atol=1e-6)


def test_level_mask():
    spec = SMALL
    params = hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3))
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    out = hashgrid_encode(params, x, spec, level_mask=mask)
    out = out.reshape(4, spec.n_levels, spec.n_features_per_level)
    assert np.abs(np.asarray(out[:, 2:])).max() == 0
    assert np.abs(np.asarray(out[:, :2])).max() > 0


def test_jit_and_batch_shapes():
    spec = SMALL
    params = hashgrid_init(jax.random.PRNGKey(0), spec)
    f = jax.jit(lambda p, x: hashgrid_encode(p, x, spec))
    out = f(params, jax.random.uniform(jax.random.PRNGKey(1), (4, 5, 3)))
    assert out.shape == (4, 5, spec.n_output_dims)
