"""Unit tests for the small pure ops: activations, contraction, rays, SH."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.ops.activations import get_activation, trunc_exp, scale_anything
from instant_nsr_pl_tpu.ops.contraction import (
    ContractionType,
    contract_to_unisphere,
    uncontract_from_unisphere,
)
from instant_nsr_pl_tpu.ops.ray import get_ray_directions, get_rays, ray_aabb_intersect
from instant_nsr_pl_tpu.ops.sh import spherical_harmonics_encoding


def test_trunc_exp_forward_and_grad_clamp():
    x = jnp.array([0.0, 1.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp([0.0, 1.0, 20.0]), rtol=1e-5)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    # gradient saturates at exp(15) for inputs > 15
    np.testing.assert_allclose(
        np.asarray(g), np.exp([0.0, 1.0, 15.0]), rtol=1e-5
    )


def test_activation_dsl():
    x = jnp.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(get_activation("none")(x), x)
    np.testing.assert_allclose(get_activation("scale2")(x), x / 2.0)
    np.testing.assert_allclose(get_activation("clamp1")(x), np.clip(x, 0, 1))
    np.testing.assert_allclose(get_activation("mul3")(x), x * 3.0)
    np.testing.assert_allclose(get_activation("+0.5")(x), x + 0.5)
    np.testing.assert_allclose(
        get_activation("sigmoid")(x), jax.nn.sigmoid(x), rtol=1e-6
    )


def test_scale_anything():
    x = jnp.array([-1.5, 0.0, 1.5])
    y = scale_anything(x, (-1.5, 1.5), (0.0, 1.0))
    np.testing.assert_allclose(y, [0.0, 0.5, 1.0])


def test_contraction_aabb_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (128, 3), minval=-1.5, maxval=1.5)
    u = contract_to_unisphere(x, 1.5, ContractionType.AABB)
    assert (u >= 0).all() and (u <= 1).all()
    back = uncontract_from_unisphere(u, 1.5, ContractionType.AABB)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_contraction_unbounded_roundtrip_and_range():
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (256, 3), minval=-30.0, maxval=30.0)
    u = contract_to_unisphere(x, 1.5, ContractionType.UN_BOUNDED_SPHERE)
    assert (u >= 0).all() and (u <= 1).all()
    back = uncontract_from_unisphere(u, 1.5, ContractionType.UN_BOUNDED_SPHERE)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=2e-3, atol=2e-3)


def test_contraction_unbounded_inner_is_linear():
    # points inside the unit ball (after scaling) are not contracted
    x = jnp.array([[0.1, 0.0, 0.0], [0.0, -0.7, 0.2]]) * 1.5
    u = contract_to_unisphere(x, 1.5, ContractionType.UN_BOUNDED_SPHERE)
    expect = (x / 1.5) / 4.0 + 0.5
    np.testing.assert_allclose(np.asarray(u), np.asarray(expect), atol=1e-6)


def test_ray_directions_opengl_convention():
    dirs = get_ray_directions(4, 4, 2.0, 2.0, 2.0, 2.0)
    assert dirs.shape == (4, 4, 3)
    assert (dirs[..., 2] == -1).all()  # -z forward
    # +y up: rows with smaller j (top of image) have larger y
    assert dirs[0, 0, 1] > dirs[3, 0, 1]


def test_get_rays_shapes_and_rotation():
    dirs = jnp.asarray(get_ray_directions(8, 6, 4.0, 4.0, 4.0, 3.0))
    c2w = jnp.eye(4)[:3]  # identity pose
    rays_o, rays_d = get_rays(dirs, c2w)
    assert rays_o.shape == (48, 3) and rays_d.shape == (48, 3)
    np.testing.assert_allclose(np.asarray(rays_o), 0.0)
    np.testing.assert_allclose(
        np.asarray(rays_d), np.asarray(dirs.reshape(-1, 3)), atol=1e-6
    )
    # batched: (N,3) directions with (N,3,4) poses
    n = 5
    key = jax.random.PRNGKey(2)
    d = jax.random.normal(key, (n, 3))
    poses = jnp.tile(jnp.eye(4)[:3][None], (n, 1, 1)).at[:, :3, 3].set(1.0)
    ro, rd = get_rays(d, poses)
    np.testing.assert_allclose(np.asarray(ro), 1.0)
    np.testing.assert_allclose(np.asarray(rd), np.asarray(d), atol=1e-6)


def test_ray_aabb_intersect_hit_and_miss():
    rays_o = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, -5.0], [0.0, 5.0, 0.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    t0, t1 = ray_aabb_intersect(rays_o, rays_d, -1.5, 1.5)
    np.testing.assert_allclose(np.asarray(t0), [3.5, 1e10, 3.5])
    np.testing.assert_allclose(np.asarray(t1), [6.5, 1e10, 6.5])
    # origin inside the box -> t_min clamps to 0
    t0, t1 = ray_aabb_intersect(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]), -1.5, 1.5
    )
    assert t0[0] == 0.0 and abs(t1[0] - 1.5) < 1e-6


def _sh_reference(d, degree):
    """Naive reference via the explicit real SH formulas."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [np.full_like(x, 0.28209479177387814)]
    if degree > 1:
        out += [-0.4886025119029199 * y, 0.4886025119029199 * z, -0.4886025119029199 * x]
    if degree > 2:
        out += [
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.31539156525252005 * (2 * z * z - x * x - y * y),
            -1.0925484305920792 * x * z,
            0.5462742152960396 * (x * x - y * y),
        ]
    if degree > 3:
        out += [
            -0.5900435899266435 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
            0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
            -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
            1.445305721320277 * z * (x * x - y * y),
            -0.5900435899266435 * x * (x * x - 3 * y * y),
        ]
    return np.stack(out, -1)


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_sh_encoding(degree):
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    enc = spherical_harmonics_encoding((d + 1) / 2, degree)
    assert enc.shape == (64, degree * degree)
    np.testing.assert_allclose(
        np.asarray(enc), _sh_reference(np.asarray(d), degree), atol=1e-5
    )


def test_sh_orthogonality():
    # integrate basis products over many random directions: should be ~I/(4pi)
    key = jax.random.PRNGKey(4)
    d = jax.random.normal(key, (200000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    enc = np.asarray(spherical_harmonics_encoding((d + 1) / 2, 3))
    gram = enc.T @ enc / enc.shape[0]
    np.testing.assert_allclose(gram, np.eye(9) / (4 * np.pi), atol=5e-3)
