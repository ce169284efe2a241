"""Vector-Matrix encoding tests: fast-path parity, sort-based segment sum,
factory integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.ops.vm import (
    VMSpec,
    segment_sum_dense_sorted,
    vm_encode,
    vm_encode_fast,
    vm_init,
)

SPEC = VMSpec(n_components=4, plane_resolution=16, line_resolution=32, n_scales=2)


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    params = vm_init(rng, SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    return params, x


def test_segment_sum_dense_sorted_matches_scatter():
    rng = np.random.RandomState(0)
    rows = rng.randint(0, 50, size=(200,)).astype(np.int32)
    vals = rng.randn(200, 3).astype(np.float32)
    got = np.asarray(segment_sum_dense_sorted(jnp.asarray(rows), jnp.asarray(vals), 50))
    expect = np.zeros((50, 3), np.float32)
    np.add.at(expect, rows, vals)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_output_shape_and_determinism(setup):
    params, x = setup
    out = vm_encode(params, x, SPEC)
    assert out.shape == (64, SPEC.n_output_dims)
    out2 = vm_encode(params, x.reshape(4, 16, 3), SPEC)
    np.testing.assert_allclose(
        np.asarray(out2).reshape(64, -1), np.asarray(out), rtol=1e-6
    )


def test_fast_forward_matches_autodiff(setup):
    params, x = setup
    a = vm_encode(params, x, SPEC)
    b = vm_encode_fast(params, x, SPEC)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_fast_table_grads_match_autodiff(setup):
    params, x = setup
    ct = jax.random.normal(jax.random.PRNGKey(2), (64, SPEC.n_output_dims))

    def loss_auto(p):
        return (vm_encode(p, x, SPEC) * ct).sum()

    def loss_fast(p):
        return (vm_encode_fast(p, x, SPEC) * ct).sum()

    ga = jax.grad(loss_auto)(params)
    gf = jax.grad(loss_fast)(params)
    for k in ga:
        np.testing.assert_allclose(
            np.asarray(ga[k]), np.asarray(gf[k]), rtol=2e-4, atol=2e-5,
            err_msg=k,
        )


def test_fast_position_grads_match_autodiff(setup):
    params, x = setup
    # keep away from cell boundaries where the lerp derivative jumps
    x = jnp.clip(x, 0.02, 0.98)
    ct = jax.random.normal(jax.random.PRNGKey(2), (64, SPEC.n_output_dims))

    ga = jax.grad(lambda xx: (vm_encode(params, xx, SPEC) * ct).sum())(x)
    gf = jax.grad(lambda xx: (vm_encode_fast(params, xx, SPEC) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gf), rtol=2e-4, atol=1e-4)


def test_factory_integration():
    from instant_nsr_pl_tpu.models.network_utils import get_encoding

    enc = get_encoding(
        3,
        {
            "otype": "VectorMatrix",
            "n_components": 4,
            "plane_resolution": 16,
            "line_resolution": 32,
            "n_scales": 1,
            "include_xyz": True,
        },
    )
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    out = enc.apply(params, x)
    assert out.shape == (8, 3 + 12)


def test_training_reduces_loss():
    """A tiny regression: VM encoding + linear head fits a smooth target."""
    spec = VMSpec(n_components=4, plane_resolution=16, line_resolution=16, n_scales=1)
    params = vm_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    target = jnp.sin(4.0 * x[:, 0]) * jnp.cos(3.0 * x[:, 1]) + x[:, 2]
    w = jnp.zeros((spec.n_output_dims,))

    def loss_fn(p, w):
        f = vm_encode_fast(p, x, spec)
        pred = f @ w
        return jnp.mean((pred - target) ** 2)

    import optax

    tx = optax.adam(2e-2)
    opt = tx.init((params, w))
    val_grad = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    l0 = None
    for i in range(200):
        loss, grads = val_grad(params, w)
        if l0 is None:
            l0 = float(loss)
        updates, opt = tx.update(grads, opt)
        params, w = optax.apply_updates((params, w), updates)
    assert float(loss) < 0.1 * l0, (l0, float(loss))
