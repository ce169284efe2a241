"""VolumeSDF analytic_jac mode (the TPU fast path for NeuS analytic
gradients) must match the plain analytic (autodiff JVP) mode: forward
outputs and second-order training gradients."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import models
import instant_nsr_pl_tpu.models  # noqa: F401


def _geometry_cfg(analytic_jac):
    return config_from_dict(
        {
            "name": "volume-sdf",
            "radius": 1.0,
            "feature_dim": 13,
            "grad_type": "analytic",
            "analytic_jac": analytic_jac,
            "isosurface": None,
            "xyz_encoding_config": {
                "otype": "HashGrid",
                "n_levels": 6,
                "n_features_per_level": 2,
                "log2_hashmap_size": 14,
                "base_resolution": 4,
                "per_level_scale": 1.5,
                "include_xyz": True,
            },
            "mlp_network_config": {
                "otype": "VanillaMLP",
                "activation": "ReLU",
                "output_activation": "none",
                "n_neurons": 32,
                "n_hidden_layers": 1,
                "sphere_init": True,
                "sphere_init_radius": 0.5,
                "weight_norm": True,
            },
        }
    )


@pytest.fixture(scope="module")
def setup():
    geo_a = models.make("volume-sdf", _geometry_cfg(False))
    geo_j = models.make("volume-sdf", _geometry_cfg(True))
    assert not geo_a.use_jac and geo_j.use_jac
    params = geo_a.init(jax.random.PRNGKey(0))
    pts = (
        jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-0.9, maxval=0.9)
    )
    return geo_a, geo_j, params, pts


def test_forward_outputs_match(setup):
    geo_a, geo_j, params, pts = setup
    sdf_a, grad_a, feat_a = geo_a.apply(params, pts)
    sdf_j, grad_j, feat_j = geo_j.apply(params, pts)
    np.testing.assert_allclose(np.asarray(sdf_j), np.asarray(sdf_a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat_j), np.asarray(feat_a), rtol=1e-5, atol=1e-6)
    scale = np.abs(np.asarray(grad_a)).max()
    np.testing.assert_allclose(
        np.asarray(grad_j), np.asarray(grad_a), rtol=1e-3, atol=1e-4 * scale
    )


def test_training_grads_match(setup):
    """Eikonal + rgb-shaped loss: d loss / d params must agree between the
    two second-order constructions (this is the NeuS training graph)."""
    geo_a, geo_j, params, pts = setup

    def loss(geo, p):
        sdf, grad, feat = geo.apply(p, pts)
        eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
        return eik + (feat**2).mean() + (sdf**2).mean()

    ga = jax.grad(lambda p: loss(geo_a, p))(params)
    gj = jax.grad(lambda p: loss(geo_j, p))(params)
    flat_a, _ = jax.flatten_util.ravel_pytree(ga)
    flat_j, _ = jax.flatten_util.ravel_pytree(gj)
    scale = float(jnp.abs(flat_a).max())
    np.testing.assert_allclose(
        np.asarray(flat_j), np.asarray(flat_a), rtol=5e-3, atol=5e-4 * scale
    )


def test_progressive_grid_jac_mode():
    """ProgressiveBandHashGrid with a traced step must also work in jac
    mode (level mask flows through the jac op)."""
    cfg = _geometry_cfg(True)
    cfg["xyz_encoding_config"] = {
        "otype": "ProgressiveBandHashGrid",
        "n_levels": 6,
        "n_features_per_level": 2,
        "log2_hashmap_size": 14,
        "base_resolution": 4,
        "per_level_scale": 1.5,
        "include_xyz": True,
        "start_level": 2,
        "start_step": 0,
        "update_steps": 100,
    }
    geo = models.make("volume-sdf", cfg)
    params = geo.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.9, maxval=0.9)

    def loss(p, step):
        sdf, grad, feat = geo.apply(p, pts, step=step)
        return ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean() + (sdf**2).mean()

    g = jax.grad(loss)(params, jnp.int32(150))
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).sum()) > 0


def _cp_cfg(analytic_jac):
    cfg = _geometry_cfg(analytic_jac)
    cfg["xyz_encoding_config"] = {
        "otype": "CP",
        "n_components": 16,
        "resolutions": [16, 48],
        "n_features": 8,
        "include_xyz": True,
        # force the Pallas (interpret-mode on CPU) kernels so the test
        # exercises the real TPU jac path, not the XLA twin
        "grad_mode": "fast",
    }
    return cfg


def test_cp_jac_mode_matches_autodiff():
    """CP encoding analytic_jac (cp_product_jac custom VJP) must match the
    plain analytic JVP construction: forward + second-order training grads."""
    geo_a = models.make("volume-sdf", _cp_cfg(False))
    geo_j = models.make("volume-sdf", _cp_cfg(True))
    assert not geo_a.use_jac and geo_j.use_jac
    assert geo_a.encoding.encoding.grad_mode == "autodiff"  # forced fallback
    assert geo_j.encoding.encoding.grad_mode == "fast"
    params = geo_j.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (96, 3), minval=-0.9, maxval=0.9
    )

    sdf_a, grad_a, feat_a = geo_a.apply(params, pts)
    sdf_j, grad_j, feat_j = geo_j.apply(params, pts)
    np.testing.assert_allclose(
        np.asarray(sdf_j), np.asarray(sdf_a), rtol=1e-4, atol=1e-5
    )
    scale = max(np.abs(np.asarray(grad_a)).max(), 1e-3)
    np.testing.assert_allclose(
        np.asarray(grad_j), np.asarray(grad_a), rtol=5e-3, atol=2e-3 * scale
    )

    def loss(geo, p):
        sdf, grad, feat = geo.apply(p, pts)
        eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
        return eik + (feat**2).mean() + (sdf**2).mean()

    ga = jax.grad(lambda p: loss(geo_a, p))(params)
    gj = jax.grad(lambda p: loss(geo_j, p))(params)
    flat_a, _ = jax.flatten_util.ravel_pytree(ga)
    flat_j, _ = jax.flatten_util.ravel_pytree(gj)
    scale = float(jnp.abs(flat_a).max())
    np.testing.assert_allclose(
        np.asarray(flat_j), np.asarray(flat_a), rtol=1e-2, atol=2e-3 * scale
    )
