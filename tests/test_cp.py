"""CP line-factorized encoding tests: interpolation correctness against a
straight gather implementation, differentiability (incl. second order —
the NeuS analytic-eikonal contract), factory integration, trainability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_encode, cp_init

SPEC = CPSpec(n_components=4, resolutions=(8, 16), n_features=6)


@pytest.fixture(scope="module")
def setup():
    params = cp_init(jax.random.PRNGKey(0), SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    return params, x


def _encode_reference(params, x, spec):
    """Straight gather-based reimplementation (no one-hot matmuls)."""
    xf = np.asarray(x, np.float32).reshape(-1, 3)
    outs = []
    for s, r in enumerate(spec.resolutions):
        g = np.ones((xf.shape[0], spec.n_components), np.float32)
        for ax in range(3):
            line = np.asarray(
                params[f"line_{s}_{ax}"], np.float32
            ).astype(np.float32)
            # match the bf16 table rounding of the matmul path
            line = np.asarray(jnp.asarray(line).astype(jnp.bfloat16), np.float32)
            p = np.clip(xf[:, ax], 0, 1) * (r - 1)
            i0 = np.clip(np.floor(p).astype(np.int64), 0, r - 2)
            f = (p - i0)[:, None]
            g = g * ((1 - f) * line[i0] + f * line[i0 + 1])
        if spec.n_features > 0:
            basis = np.asarray(
                jnp.asarray(params[f"basis_{s}"]).astype(jnp.bfloat16), np.float32
            )
            g = (
                np.asarray(jnp.asarray(g).astype(jnp.bfloat16), np.float32)
                @ basis
            )
        outs.append(g)
    return np.concatenate(outs, axis=-1)


def test_matches_gather_reference(setup):
    params, x = setup
    got = np.asarray(cp_encode(params, x, SPEC))
    expect = _encode_reference(params, x, SPEC)
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-5)


def test_output_shape_and_batch_shape(setup):
    params, x = setup
    out = cp_encode(params, x, SPEC)
    assert out.shape == (64, SPEC.n_output_dims)
    out2 = cp_encode(params, x.reshape(4, 16, 3), SPEC)
    np.testing.assert_allclose(
        np.asarray(out2).reshape(64, -1), np.asarray(out), rtol=1e-6
    )


def _encode_fp32_jax(params, x, spec):
    """Pure-fp32 gather-based twin of cp_encode (differentiable)."""
    xf = x.reshape(-1, 3)
    outs = []
    for s, r in enumerate(spec.resolutions):
        g = jnp.ones((xf.shape[0], spec.n_components), jnp.float32)
        for ax in range(3):
            line = params[f"line_{s}_{ax}"]
            p = jnp.clip(xf[:, ax], 0.0, 1.0) * (r - 1)
            i0 = jnp.clip(jnp.floor(p), 0.0, float(r - 2))
            f = (p - i0)[:, None]
            ii = i0.astype(jnp.int32)
            g = g * ((1 - f) * line[ii] + f * line[ii + 1])
        if spec.n_features > 0:
            g = g @ params[f"basis_{s}"]
        outs.append(g)
    return jnp.concatenate(outs, axis=-1)


def test_grads_match_fp32_reference(setup):
    """Autodiff grads of the one-hot-matmul path must match a plain
    gather-based fp32 implementation (tolerances cover the bf16 table
    rounding of the matmul path)."""
    params, x = setup
    x = jnp.clip(x, 0.03, 0.97)
    ct = jax.random.normal(jax.random.PRNGKey(2), (64, SPEC.n_output_dims))

    gx = jax.grad(lambda xx: (cp_encode(params, xx, SPEC) * ct).sum())(x)
    gx_ref = jax.grad(lambda xx: (_encode_fp32_jax(params, xx, SPEC) * ct).sum())(x)
    scale = float(jnp.abs(gx_ref).max())
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=3e-2, atol=3e-2 * scale
    )

    gp = jax.grad(lambda p: (cp_encode(p, x, SPEC) * ct).sum())(params)
    gp_ref = jax.grad(lambda p: (_encode_fp32_jax(p, x, SPEC) * ct).sum())(params)
    for k in gp:
        s = float(jnp.abs(gp_ref[k]).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]),
            rtol=3e-2, atol=3e-2 * s, err_msg=k,
        )


def test_second_order_differentiable(setup):
    """grad-of-grad must work (NeuS analytic eikonal builds d/dparams of
    d encode/dx; reference contract models/geometry.py:176-180)."""
    params, x = setup
    x = jnp.clip(x[:8], 0.03, 0.97)

    def sdf_like(p, xx):
        return cp_encode(p, xx, SPEC).sum(axis=-1).sum()

    def eikonal(p):
        g = jax.grad(sdf_like, argnums=1)(p, x)
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

    grads = jax.grad(eikonal)(params)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_factory_integration():
    from instant_nsr_pl_tpu.models.network_utils import get_encoding

    enc = get_encoding(
        3,
        {
            "otype": "CP",
            "n_components": 4,
            "resolutions": [8, 16],
            "n_features": 6,
            "include_xyz": True,
        },
    )
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    out = enc.apply(params, x)
    assert out.shape == (8, 3 + 12)


def test_training_reduces_loss():
    spec = CPSpec(n_components=8, resolutions=(16,), n_features=0)
    params = cp_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    target = jnp.sin(4.0 * x[:, 0]) * jnp.cos(3.0 * x[:, 1]) + x[:, 2]
    w = jnp.zeros((spec.n_output_dims,))

    def loss_fn(p, w):
        pred = cp_encode(p, x, spec) @ w
        return jnp.mean((pred - target) ** 2)

    import optax

    tx = optax.adam(5e-2)
    opt = tx.init((params, w))
    val_grad = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    l0 = None
    for _ in range(300):
        loss, grads = val_grad(params, w)
        if l0 is None:
            l0 = float(loss)
        updates, opt = tx.update(grads, opt)
        params, w = optax.apply_updates((params, w), updates)
    assert float(loss) < 0.1 * l0, (l0, float(loss))
