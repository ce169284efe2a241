"""Hash-grid per-group tap dedup wired through the NeRF renderer: with the
group-compacted march's aligned-block guarantee, the dedup path must render
the same images and train the same gradients as the per-sample path (it is
a pure gather-count optimization; reference role: tcnn HashGrid taps,
models/network_utils.py:90)."""

import jax
import jax.numpy as jnp
import numpy as np

import instant_nsr_pl_tpu.models  # noqa: F401  (registry population)
from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.ops.marching import pack_bricks
from instant_nsr_pl_tpu.registry import models

CAPACITY = 32768


def _model(dedup: bool):
    cfg = config_from_dict(
        {
            "name": "nerf",
            "radius": 1.0,
            # reference-scale sampling so the strided march picks k=8
            "num_samples_per_ray": 1024,
            "learned_background": False,
            "grid_prune": True,
            "hash_tap_dedup": dedup,
            "background_color": "white",
            "geometry": {
                "name": "volume-density",
                "radius": 1.0,
                "feature_dim": 16,
                "density_activation": "trunc_exp",
                "density_bias": -1,
                "isosurface": None,
                "xyz_encoding_config": {
                    "otype": "HashGrid",
                    "n_levels": 8,
                    "n_features_per_level": 2,
                    "log2_hashmap_size": 16,
                    "base_resolution": 16,
                    "per_level_scale": 1.447269237440378,
                    "grad_mode": "fast",  # dedup lives on the fast path
                },
                "mlp_network_config": {
                    "otype": "FullyFusedMLP",
                    "activation": "ReLU",
                    "output_activation": "none",
                    "n_neurons": 64,
                    "n_hidden_layers": 1,
                },
            },
            "texture": {
                "name": "volume-radiance",
                "input_feature_dim": 16,
                "dir_encoding_config": {
                    "otype": "SphericalHarmonics",
                    "degree": 4,
                },
                "mlp_network_config": {
                    "otype": "FullyFusedMLP",
                    "activation": "ReLU",
                    "output_activation": "Sigmoid",
                    "n_neurons": 64,
                    "n_hidden_layers": 2,
                },
            },
        }
    )
    return models.make(cfg.name, cfg)


def _scene(model):
    params = model.init(jax.random.PRNGKey(0))
    occ = model.init_occupancy()
    grid = occ["grid"]
    ones = jnp.ones_like(grid.binary)
    res = getattr(model, "occupancy_grid_res", None) or model.occ_spec.resolution
    occ = {
        "grid": grid._replace(
            binary=ones,
            binary_dilated=ones,
            bricks=pack_bricks(ones, res),
        )
    }
    key = jax.random.PRNGKey(1)
    n = 32
    rays_o = jnp.zeros((n, 3)).at[:, 2].set(-2.5)
    d = jax.random.normal(key, (n, 3)) * 0.12 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return params, occ, rays_o, rays_d


def test_dedup_is_configured():
    m = _model(True)
    enc = m.geometry.encoding_with_network.encoding
    assert enc.dedup_spec is not None
    gs = enc.dedup_spec.dedup_group_sizes
    assert any(g == 8 for g in gs), gs
    assert gs[-1] == 0, gs  # finest levels stay per-sample
    assert _model(False).geometry.encoding_with_network.encoding.dedup_spec is None


def test_dedup_render_matches():
    m1, m0 = _model(True), _model(False)
    params, occ, rays_o, rays_d = _scene(m1)

    def render(m):
        out = m.forward(
            params, occ, rays_o, rays_d,
            background_color=jnp.ones(3),
            capacity=CAPACITY,
        )
        return out["comp_rgb"], out["depth"], out["opacity"]

    rgb1, depth1, op1 = render(m1)
    rgb0, depth0, op0 = render(m0)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth1), np.asarray(depth0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(op1), np.asarray(op0),
                               rtol=1e-4, atol=1e-5)


def test_dedup_train_gradients_match():
    m1, m0 = _model(True), _model(False)
    params, occ, rays_o, rays_d = _scene(m1)
    target = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(2), (32, 3)), 0.0, 1.0
    )

    def loss(p, m):
        out = m.forward(
            p, occ, rays_o, rays_d,
            background_color=jnp.ones(3),
            capacity=CAPACITY,
        )
        return ((out["comp_rgb"] - target) ** 2).sum()

    g1 = jax.grad(lambda p: loss(p, m1))(params)
    g0 = jax.grad(lambda p: loss(p, m0))(params)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat0, _ = jax.tree_util.tree_flatten(g0)
    for a, b in zip(flat1, flat0):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() < 3e-3 * scale, (a.shape,)


# ---------------------------------------------------------------------------
# NeuS (VolumeSDF, jac second-order path)
# ---------------------------------------------------------------------------


def _neus_model(dedup: bool):
    cfg = config_from_dict(
        {
            "name": "neus",
            "radius": 1.0,
            "num_samples_per_ray": 1024,
            "learned_background": False,
            "grid_prune": True,
            "hash_tap_dedup": dedup,
            "background_color": "white",
            "cos_anneal_end": 200,
            "variance": {"init_val": 0.3, "modulate": False},
            "geometry": {
                "name": "volume-sdf",
                "radius": 1.0,
                "feature_dim": 13,
                "grad_type": "analytic",
                "analytic_jac": True,  # jac path even on CPU
                "isosurface": None,
                "xyz_encoding_config": {
                    "otype": "HashGrid",
                    "n_levels": 8,
                    "n_features_per_level": 2,
                    "log2_hashmap_size": 16,
                    "base_resolution": 16,
                    "per_level_scale": 1.447269237440378,
                    "grad_mode": "fast",
                    "include_xyz": True,
                },
                "mlp_network_config": {
                    "otype": "VanillaMLP",
                    "activation": "ReLU",
                    "output_activation": "none",
                    "n_neurons": 64,
                    "n_hidden_layers": 1,
                    "sphere_init": True,
                    "sphere_init_radius": 0.5,
                    "weight_norm": True,
                },
            },
            "texture": {
                "name": "volume-radiance",
                "input_feature_dim": 16,
                "dir_encoding_config": {
                    "otype": "SphericalHarmonics",
                    "degree": 4,
                },
                "mlp_network_config": {
                    "otype": "FullyFusedMLP",
                    "activation": "ReLU",
                    "output_activation": "Sigmoid",
                    "n_neurons": 64,
                    "n_hidden_layers": 2,
                },
            },
        }
    )
    return models.make(cfg.name, cfg)


def test_neus_dedup_is_configured():
    m = _neus_model(True)
    enc = m.geometry.encoding
    assert enc.dedup_spec is not None
    assert any(g == 8 for g in enc.dedup_spec.dedup_group_sizes)
    assert _neus_model(False).geometry.encoding.dedup_spec is None


def test_neus_dedup_render_and_grads_match():
    m1, m0 = _neus_model(True), _neus_model(False)
    params, occ, rays_o, rays_d = _scene(m1)
    target = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(3), (32, 3)), 0.0, 1.0
    )

    def loss(p, m):
        out = m.forward(
            p, occ, rays_o, rays_d,
            background_color=jnp.ones(3),
            capacity=CAPACITY, step=100, train=True,
        )
        eik = ((jnp.linalg.norm(out["sdf_grad_samples"], axis=-1) - 1.0) ** 2)
        eik = jnp.where(out["sample_valid"], eik, 0.0).mean()
        return ((out["comp_rgb"] - target) ** 2).sum() + 0.1 * eik

    l1, l0 = float(loss(params, m1)), float(loss(params, m0))
    np.testing.assert_allclose(l1, l0, rtol=1e-4)
    g1 = jax.grad(lambda p: loss(p, m1))(params)
    g0 = jax.grad(lambda p: loss(p, m0))(params)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat0, _ = jax.tree_util.tree_flatten(g0)
    for a, b in zip(flat1, flat0):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() < 3e-3 * scale, (a.shape,)
