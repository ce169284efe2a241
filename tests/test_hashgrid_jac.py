"""hashgrid_encode_with_jac: the second-order-capable fast path. Its
(feat, jac) forward must match autodiff jacfwd of hashgrid_encode, and its
hand-written backward (fused table segment-sum + trilinear mixed second
derivatives) must match autodiff of the same jac-consuming loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_with_jac,
    hashgrid_init,
)

SPEC = HashGridSpec(
    n_levels=6, log2_hashmap_size=14, base_resolution=4, per_level_scale=1.5
)


@pytest.fixture(scope="module")
def setup():
    table = hashgrid_init(jax.random.PRNGKey(0), SPEC) * 1000.0
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (256, 3), minval=0.01, maxval=0.99
    )
    return table, x


def _jac_autodiff(table, x):
    """(3, N, LF) reference jacobian via jacfwd of the autodiff encode."""
    jac = jax.vmap(
        lambda xx: jax.jacfwd(lambda p: hashgrid_encode(table, p[None], SPEC)[0])(xx)
    )(x)  # (N, LF, 3)
    return jnp.transpose(jac, (2, 0, 1))


def test_forward_feat_and_jac_match_autodiff(setup):
    table, x = setup
    feat, jac = hashgrid_encode_with_jac(table, x, SPEC)
    feat_ref = hashgrid_encode(table, x, SPEC)
    np.testing.assert_array_equal(np.asarray(feat), np.asarray(feat_ref))
    jac_ref = _jac_autodiff(table, x)
    np.testing.assert_allclose(
        np.asarray(jac), np.asarray(jac_ref), rtol=1e-4, atol=1e-4
    )


def test_backward_matches_autodiff(setup):
    """Loss uses BOTH outputs (as the eikonal + rgb losses do): grads w.r.t.
    table and x must match the pure-autodiff construction."""
    table, x = setup
    ct_f = jax.random.normal(jax.random.PRNGKey(2), (256, SPEC.n_output_dims))
    ct_j = jax.random.normal(jax.random.PRNGKey(3), (3, 256, SPEC.n_output_dims))

    def loss_fast(t, xx):
        feat, jac = hashgrid_encode_with_jac(t, xx, SPEC)
        return (feat * ct_f).sum() + (jac * ct_j).sum()

    def loss_auto(t, xx):
        feat = hashgrid_encode(t, xx, SPEC)
        jac = jnp.transpose(
            jax.vmap(
                lambda p: jax.jacfwd(
                    lambda q: hashgrid_encode(t, q[None], SPEC)[0]
                )(p)
            )(xx),
            (2, 0, 1),
        )
        return (feat * ct_f).sum() + (jac * ct_j).sum()

    gf_t, gf_x = jax.grad(loss_fast, argnums=(0, 1))(table, x)
    ga_t, ga_x = jax.grad(loss_auto, argnums=(0, 1))(table, x)
    scale_t = np.abs(np.asarray(ga_t)).max()
    assert np.abs(np.asarray(ga_t) - np.asarray(gf_t)).max() < 3e-3 * scale_t
    scale_x = np.abs(np.asarray(ga_x)).max()
    np.testing.assert_allclose(
        np.asarray(gf_x), np.asarray(ga_x), rtol=1e-3, atol=1e-4 * scale_x
    )


def test_backward_with_level_mask(setup):
    table, x = setup
    mask = jnp.asarray([1.0, 1.0, 0.5, 0.0, 0.0, 0.0])
    ct_f = jax.random.normal(jax.random.PRNGKey(2), (256, SPEC.n_output_dims))

    def loss_fast(t):
        feat, jac = hashgrid_encode_with_jac(t, x, SPEC, mask)
        return (feat * ct_f).sum() + (jac**2).sum()

    def loss_auto(t):
        feat = hashgrid_encode(t, x, SPEC, mask)
        jac = jnp.transpose(
            jax.vmap(
                lambda p: jax.jacfwd(
                    lambda q: hashgrid_encode(t, q[None], SPEC, mask)[0]
                )(p)
            )(x),
            (2, 0, 1),
        )
        return (feat * ct_f).sum() + (jac**2).sum()

    gf = jax.grad(loss_fast)(table)
    ga = jax.grad(loss_auto)(table)
    scale = np.abs(np.asarray(ga)).max()
    assert np.abs(np.asarray(ga) - np.asarray(gf)).max() < 3e-3 * scale


def test_eikonal_shaped_training_graph(setup):
    """The NeuS-shaped use: sdf = mlp(feat), grad via jac chain rule,
    eikonal loss on the grad — full reverse-mode must run and be finite."""
    table, x = setup
    w = jax.random.normal(jax.random.PRNGKey(4), (SPEC.n_output_dims, 1)) * 0.1

    def loss(t, w):
        feat, jac = hashgrid_encode_with_jac(t, x, SPEC)
        h = jnp.tanh(feat @ w)  # (N, 1) "sdf"
        dh = (1.0 - h**2) * w.T  # d h / d feat: (N, LF)
        g = jnp.einsum("dnf,nf->nd", jac, dh)  # (N, 3) sdf gradient
        eik = ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()
        return eik + (h**2).mean()

    gt, gw = jax.grad(loss, argnums=(0, 1))(table, w)
    for g in (gt, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(gt).sum()) > 0


# ---------------------------------------------------------------------------
# per-group tap dedup on the jac path (NeuS analytic second-order)
# ---------------------------------------------------------------------------

import dataclasses


def _block_setup_jac(g=8, nblocks=48, step=0.01):
    """Uniform-step runs per aligned g-block (the group-compacted march
    layout); step=0.01 gives a mixed dedup split for SPEC (coarse levels
    g=8/g=4, finest per-sample)."""
    spec = dataclasses.replace(SPEC, dedup_group=g, dedup_step=step)
    table = hashgrid_init(jax.random.PRNGKey(0), spec) * 1000.0
    x0 = jax.random.uniform(
        jax.random.PRNGKey(4), (nblocks, 3), minval=0.02, maxval=0.98
    )
    d = jax.random.normal(jax.random.PRNGKey(5), (nblocks, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    i = jnp.arange(g, dtype=jnp.float32)[None, :, None]
    x = jnp.clip(x0[:, None] + d[:, None] * (i * step), 0.0, 1.0)
    return spec, table, x.reshape(-1, 3)


def test_dedup_jac_forward_matches_per_sample():
    spec, table, x = _block_setup_jac()
    assert any(v for v in spec.dedup_group_sizes), spec.dedup_group_sizes
    feat_d, jac_d = hashgrid_encode_with_jac(table, x, spec)
    feat_p, jac_p = hashgrid_encode_with_jac(table, x, SPEC)
    np.testing.assert_allclose(
        np.asarray(feat_d), np.asarray(feat_p), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jac_d), np.asarray(jac_p), rtol=1e-4, atol=1e-4
    )


def test_dedup_jac_backward_matches_per_sample():
    spec, table, x = _block_setup_jac()
    n = x.shape[0]
    ct_f = jax.random.normal(jax.random.PRNGKey(6), (n, SPEC.n_output_dims))
    ct_j = jax.random.normal(
        jax.random.PRNGKey(7), (3, n, SPEC.n_output_dims)
    )

    def loss(t, xx, sp):
        feat, jac = hashgrid_encode_with_jac(t, xx, sp)
        return (feat * ct_f).sum() + (jac * ct_j).sum()

    gd_t, gd_x = jax.grad(loss, argnums=(0, 1))(table, x, spec)
    gp_t, gp_x = jax.grad(loss, argnums=(0, 1))(table, x, SPEC)
    scale_t = np.abs(np.asarray(gp_t)).max()
    assert np.abs(np.asarray(gd_t) - np.asarray(gp_t)).max() < 3e-3 * scale_t
    scale_x = np.abs(np.asarray(gp_x)).max()
    np.testing.assert_allclose(
        np.asarray(gd_x), np.asarray(gp_x), rtol=1e-3, atol=1e-4 * scale_x
    )


def test_dedup_group_sizes_divide_group():
    """ADVICE r4 (medium): a halved dedup block size must DIVIDE the
    configured group, else blocks straddle the march's k-aligned single-ray
    runs. Non-power-of-two groups must fall back to per-sample (0) rather
    than emit a non-dividing g."""
    for group in (9, 11, 12):
        spec = dataclasses.replace(SPEC, dedup_group=group, dedup_step=0.01)
        for g in spec.dedup_group_sizes:
            assert g == 0 or (g >= 4 and group % g == 0), (
                group,
                spec.dedup_group_sizes,
            )
    # power-of-two groups keep their mixed split (the production config)
    spec8 = dataclasses.replace(SPEC, dedup_group=8, dedup_step=0.01)
    assert any(g == 8 for g in spec8.dedup_group_sizes)
    assert all(g in (0, 4, 8) for g in spec8.dedup_group_sizes)


def test_dedup_jac_grid_aligned_positions():
    """ADVICE r4: at exactly-integer grid positions the lattice dtent must
    reproduce the per-sample floor-cell (right-difference) derivative, not
    zero. Build blocks whose first sample is grid-aligned for level 0."""
    g, step = 8, 0.002
    spec = dataclasses.replace(SPEC, dedup_group=g, dedup_step=step)
    assert spec.dedup_group_sizes[0] == g
    s0 = spec.scales[0]
    # x such that x * s0 + 0.5 is an exact integer (grid-aligned at level 0)
    ks = np.arange(1, 3, dtype=np.float64)
    x0 = ((ks - 0.5) / s0).astype(np.float32)
    starts = np.stack([x0, x0[::-1], np.full_like(x0, 0.37)], axis=-1)
    i = np.arange(g, dtype=np.float32)[None, :, None]
    d = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    x = jnp.asarray(
        (starts[:, None] + d[:, None] * (i * step)).reshape(-1, 3)
    )
    # the first sample of each block must be exactly grid-aligned in dim 0/1
    pos = np.asarray(x) * s0 + 0.5
    assert abs(pos[0, 0] - round(pos[0, 0])) < 1e-5
    table = hashgrid_init(jax.random.PRNGKey(0), spec) * 1000.0
    feat_d, jac_d = hashgrid_encode_with_jac(table, x, spec)
    feat_p, jac_p = hashgrid_encode_with_jac(table, x, SPEC)
    np.testing.assert_allclose(
        np.asarray(feat_d), np.asarray(feat_p), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jac_d), np.asarray(jac_p), rtol=1e-4, atol=1e-4
    )


def test_dedup_jac_second_order_training_graph():
    """Differentiate THROUGH the jac (eikonal-style): grad of a loss built
    on the jac norm must match between dedup and per-sample paths."""
    spec, table, x = _block_setup_jac()

    def loss(t, sp):
        feat, jac = hashgrid_encode_with_jac(t, x, sp)
        gnorm = jnp.sqrt((jac.sum(-1) ** 2).sum(0) + 1e-9)
        return ((gnorm - 1.0) ** 2).mean() + (feat**2).mean()

    gd = jax.grad(loss)(table, spec)
    gp = jax.grad(loss)(table, SPEC)
    scale = np.abs(np.asarray(gp)).max()
    assert np.abs(np.asarray(gd) - np.asarray(gp)).max() < 3e-3 * scale
