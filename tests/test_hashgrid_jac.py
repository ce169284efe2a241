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
