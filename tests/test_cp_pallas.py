"""Pallas CP kernel (ops/cp_pallas.py) vs the XLA formulation: forward and
gradients to bf16-operand tolerance — the kernel's tent operand bakes the
interpolation weights into bf16 (the XLA twin applies them in f32 after
the matmul), so everything carries ~2^-9 relative weight error on top of
the bf16 table rounding both paths share (accumulators are f32). Runs the
real kernel logic through the Pallas interpreter on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_encode, cp_init
from instant_nsr_pl_tpu.ops.cp_pallas import cp_product, cp_product_reference


@pytest.fixture
def lines():
    key = jax.random.PRNGKey(0)
    R, C, N = 64, 16, 300
    ks = jax.random.split(key, 5)
    lx = jax.random.normal(ks[0], (R, C)) * 0.1
    ly = jax.random.normal(ks[1], (R, C)) * 0.1
    lz = jax.random.normal(ks[2], (R, C)) * 0.1
    # includes out-of-range coords (clip path) and exact grid points
    u3 = jax.random.uniform(ks[3], (3, N), minval=-0.05, maxval=1.05)
    u3 = u3.at[:, 0].set(0.0).at[:, 1].set(1.0).at[:, 2].set(0.5)
    ct = jax.random.normal(ks[4], (16, N))
    return R, lx, ly, lz, u3, ct


def test_forward_matches_xla(lines):
    R, lx, ly, lz, u3, _ = lines
    ref = cp_product_reference(lx, ly, lz, u3, R)
    got = cp_product(lx, ly, lz, u3, R)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref),
        atol=6e-3 * float(jnp.abs(ref).max()),
    )


def test_gradients_match_xla(lines):
    R, lx, ly, lz, u3, ct = lines

    def loss(fn):
        return lambda a, b, c, u: (fn(a, b, c, u, R) * ct).sum()

    g_ref = jax.grad(loss(cp_product_reference), argnums=(0, 1, 2, 3))(
        lx, ly, lz, u3
    )
    g_got = jax.grad(loss(cp_product), argnums=(0, 1, 2, 3))(lx, ly, lz, u3)
    # table grads: both paths round per-sample contributions to bf16
    for a, b in zip(g_ref[:3], g_got[:3]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=8e-3 * float(jnp.abs(a).max())
        )
    np.testing.assert_allclose(
        np.asarray(g_got[3]), np.asarray(g_ref[3]),
        atol=8e-3 * float(jnp.abs(g_ref[3]).max()),
    )


def test_zero_coord_grad_outside_domain(lines):
    R, lx, ly, lz, u3, ct = lines
    u3 = u3.at[0, 5].set(-0.02).at[1, 6].set(1.02)
    du = jax.grad(lambda u: (cp_product(lx, ly, lz, u, R) * ct).sum())(u3)
    assert float(du[0, 5]) == 0.0 and float(du[1, 6]) == 0.0


def test_cp_encode_pallas_matches_xla_full():
    spec = CPSpec(n_components=16, resolutions=(16, 64), n_features=8)
    params = cp_init(jax.random.PRNGKey(1), spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (257, 3))
    ref = cp_encode(params, x, spec, impl="xla")
    got = cp_encode(params, x, spec, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref),
        atol=6e-3 * float(np.abs(np.asarray(ref)).max()),
    )

    def loss(p, impl):
        return (cp_encode(p, x, spec, impl=impl) ** 2).sum()

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_got = jax.grad(lambda p: loss(p, "pallas"))(params)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_got[k])
        np.testing.assert_allclose(b, a, atol=8e-3 * max(np.abs(a).max(), 1e-3))


def test_padding_of_non_block_multiple_n():
    # N deliberately not a multiple of any block size
    R, C, N = 32, 8, 77
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    lx, ly, lz = (jax.random.normal(k, (R, C)) * 0.1 for k in ks[:3])
    u3 = jax.random.uniform(ks[3], (3, N))
    ref = cp_product_reference(lx, ly, lz, u3, R)
    got = cp_product(lx, ly, lz, u3, R)
    assert got.shape == (C, N)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref),
        atol=6e-3 * float(jnp.abs(ref).max()),
    )


def test_jac_forward_matches_autodiff(lines):
    """cp_product_jac's Jacobian output must equal jacfwd of the XLA twin."""
    from instant_nsr_pl_tpu.ops.cp_pallas import cp_product_jac

    R, lx, ly, lz, u3, _ = lines
    prod, jac = cp_product_jac(lx, ly, lz, u3, R)
    ref = cp_product_reference(lx, ly, lz, u3, R)
    np.testing.assert_allclose(
        np.asarray(prod), np.asarray(ref),
        atol=6e-3 * float(jnp.abs(ref).max()),
    )

    def f(u):
        return cp_product_reference(lx, ly, lz, u, R)

    # jacfwd wrt the (3, N) coords; extract the diagonal over N
    jr = jax.jacfwd(f)(u3)  # (C, N, 3, N)
    C, N = ref.shape
    diag = jnp.einsum("cnan->acn", jr)  # (3, C, N)
    scale = float(jnp.abs(diag).max())
    np.testing.assert_allclose(
        np.asarray(jac), np.asarray(diag), atol=6e-3 * max(scale, 1.0)
    )


def test_jac_gradients_match_autodiff(lines):
    """VJP through (prod, jac) must match autodiff of the XLA twin's
    (value, jacobian) pair — the second-order contract NeuS relies on."""
    from instant_nsr_pl_tpu.ops.cp_pallas import cp_product_jac

    R, lx, ly, lz, u3, ct = lines
    ctj = jax.random.normal(jax.random.PRNGKey(9), (3, *ct.shape))

    def loss_fast(a, b, c, u):
        prod, jac = cp_product_jac(a, b, c, u, R)
        return (prod * ct).sum() + (jac * ctj).sum()

    def loss_ref(a, b, c, u):
        prod = cp_product_reference(a, b, c, u, R)

        def f(uu):
            return cp_product_reference(a, b, c, uu, R)

        jr = jax.jacfwd(f)(u)
        jac = jnp.einsum("cnan->acn", jr)
        return (prod * ct).sum() + (jac * ctj).sum()

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2, 3))(lx, ly, lz, u3)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(lx, ly, lz, u3)
    for a, b in zip(g_ref[:3], g_fast[:3]):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1.2e-2 * scale)
    scale = max(float(jnp.abs(g_ref[3]).max()), 1e-3)
    np.testing.assert_allclose(
        np.asarray(g_fast[3]), np.asarray(g_ref[3]), atol=8e-3 * scale
    )


def test_cp_encode_with_jac_impls_agree():
    from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_encode_with_jac, cp_init

    spec = CPSpec(n_components=16, resolutions=(16, 64), n_features=8)
    params = cp_init(jax.random.PRNGKey(1), spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (129, 3))
    e1, j1 = cp_encode_with_jac(params, x, spec, impl="pallas")
    e2, j2 = cp_encode_with_jac(params, x, spec, impl="xla")
    assert e1.shape == (129, spec.n_output_dims)
    assert j1.shape == (3, 129, spec.n_output_dims)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=2e-5)
    scale = max(float(jnp.abs(j2).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(j1), np.asarray(j2), atol=8e-3 * scale
    )


def test_jac_basis_matches_unfused(lines):
    """cp_product_jac_basis == basis-projected cp_product_jac (values and
    all gradients incl. d basis), to bf16-operand tolerance."""
    from instant_nsr_pl_tpu.ops.cp_pallas import (
        cp_product_jac,
        cp_product_jac_basis,
    )

    R, lx, ly, lz, u3, _ = lines
    C = lx.shape[1]
    F = 8
    basis = jax.random.normal(jax.random.PRNGKey(11), (C, F)) / np.sqrt(C)

    enc_b, jac_b = cp_product_jac_basis(lx, ly, lz, basis, u3, R)

    prod, jac = cp_product_jac(lx, ly, lz, u3, R)
    bt = basis.T.astype(jnp.bfloat16)
    enc_u = jnp.dot(bt, prod.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    jac_u = jnp.einsum("fc,acn->afn", bt, jac.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    s = max(float(jnp.abs(enc_u).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(enc_b), np.asarray(enc_u), atol=8e-3 * s)
    s = max(float(jnp.abs(jac_u).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(jac_b), np.asarray(jac_u), atol=8e-3 * s)

    ct_e = jax.random.normal(jax.random.PRNGKey(12), enc_b.shape)
    ct_j = jax.random.normal(jax.random.PRNGKey(13), jac_b.shape)

    def loss_b(lx, ly, lz, b, u):
        e, j = cp_product_jac_basis(lx, ly, lz, b, u, R)
        return jnp.sum(e * ct_e) + jnp.sum(j * ct_j)

    def loss_u(lx, ly, lz, b, u):
        p, j = cp_product_jac(lx, ly, lz, u, R)
        bt = b.T.astype(jnp.bfloat16)
        e = jnp.dot(bt, p.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        jj = jnp.einsum("fc,acn->afn", bt, j.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return jnp.sum(e * ct_e) + jnp.sum(jj * ct_j)

    g_b = jax.grad(loss_b, argnums=(0, 1, 2, 3, 4))(lx, ly, lz, basis, u3)
    g_u = jax.grad(loss_u, argnums=(0, 1, 2, 3, 4))(lx, ly, lz, basis, u3)
    for a, b in zip(g_u, g_b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=1.5e-2 * scale)


def test_jac_basis_stacked_matches_per_scale():
    """Stacked-scales jac op == the per-scale jac-basis ops concatenated
    (nested resolutions => the fine-grid stacking is the same function),
    values + all gradients."""
    from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_init, cp_encode_with_jac

    spec = CPSpec(n_components=16, resolutions=(17, 65), n_features=8)
    params = cp_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))

    enc_s, jac_s = cp_encode_with_jac(params, x, spec, impl="pallas", stacked=True)
    enc_p, jac_p = cp_encode_with_jac(params, x, spec, impl="pallas", stacked=False)
    s = max(float(jnp.abs(enc_p).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(enc_s), np.asarray(enc_p), atol=1.5e-2 * s)
    s = max(float(jnp.abs(jac_p).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(jac_s), np.asarray(jac_p), atol=1.5e-2 * s)

    ct_e = jax.random.normal(jax.random.PRNGKey(2), enc_p.shape)
    ct_j = jax.random.normal(jax.random.PRNGKey(3), jac_p.shape)

    def loss(stacked):
        def f(p, xx):
            e, j = cp_encode_with_jac(p, xx, spec, impl="pallas", stacked=stacked)
            return jnp.sum(e * ct_e) + jnp.sum(j * ct_j)

        return f

    g_s = jax.grad(loss(True), argnums=(0, 1))(params, x)
    g_p = jax.grad(loss(False), argnums=(0, 1))(params, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_s)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(b - a).max() <= 6e-2 * scale
        assert np.linalg.norm(b - a) <= 2.5e-2 * (np.linalg.norm(a) + 1e-6)


def test_jac_basis_stacked_through_eikonal_graph():
    """Second-order contract: the eikonal-style loss (grad-of-jac-output)
    through the stacked op matches the per-scale path."""
    from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_init, cp_encode_with_jac

    spec = CPSpec(n_components=16, resolutions=(17, 65), n_features=8)
    params = cp_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (200, 3))
    w = jax.random.normal(jax.random.PRNGKey(2), (spec.n_output_dims,))

    def eikonal(p, stacked):
        enc, jac = cp_encode_with_jac(p, x, spec, impl="pallas", stacked=stacked)
        sdf_grad = jnp.einsum("e,aNe->Na", w, jac)  # linear head
        return jnp.mean((jnp.linalg.norm(sdf_grad, axis=-1) - 1.0) ** 2) + (
            enc @ w
        ).mean()

    g_s = jax.grad(lambda p: eikonal(p, True))(params)
    g_p = jax.grad(lambda p: eikonal(p, False))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_s)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.linalg.norm(b - a) <= 3e-2 * (np.linalg.norm(a) + 1e-6)
