"""NeuS variance modulation: inv_s is clamped by the step-scheduled cap once
modulation starts, using the pre-modulation snapshot carried in the train
state (reference models/neus.py:15-43 mutates Python attributes; here it is
a pure function of (state, step))."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.models.neus import VarianceNetwork


def test_inv_s_modulation_schedule():
    var = VarianceNetwork(
        config_from_dict(
            {
                "init_val": 0.3,
                "modulate": True,
                "mod_start_steps": 10,
                "reach_max_steps": 100,
                "max_inv_s": 4096.0,
            }
        )
    )
    # a large raw variance that the modulation must clamp
    params = {"variance": jnp.float32(1.0)}  # raw inv_s = e^10 ~ 22026
    prev = jnp.float32(50.0)

    # before modulation starts: raw value untouched
    v = float(var.inv_s(params, step=5, prev_inv_s=prev))
    assert abs(v - float(np.exp(10.0))) < 1.0

    # after start: clamped to ratio * (max - prev) + prev
    v20 = float(var.inv_s(params, step=20, prev_inv_s=prev))
    expect20 = 0.2 * (4096.0 - 50.0) + 50.0
    assert abs(v20 - expect20) < 1.0

    # past reach_max_steps: capped at max_inv_s
    v200 = float(var.inv_s(params, step=200, prev_inv_s=prev))
    assert abs(v200 - 4096.0) < 1.0


def test_extra_state_snapshot():
    from instant_nsr_pl_tpu.registry import models
    import instant_nsr_pl_tpu.models  # noqa: F401

    cfg = config_from_dict(
        {
            "name": "neus",
            "radius": 1.0,
            "num_samples_per_ray": 32,
            "learned_background": False,
            "grid_prune": True,
            "cos_anneal_end": 0,
            "variance": {
                "init_val": 0.3,
                "modulate": True,
                "mod_start_steps": 4,
                "reach_max_steps": 10,
                "max_inv_s": 1024.0,
            },
            "geometry": {
                "name": "volume-sdf",
                "radius": 1.0,
                "feature_dim": 8,
                "grad_type": "analytic",
                "isosurface": {"resolution": 16, "chunk": 8192},
                "xyz_encoding_config": {
                    "otype": "HashGrid",
                    "n_levels": 4,
                    "n_features_per_level": 2,
                    "log2_hashmap_size": 12,
                    "base_resolution": 4,
                    "per_level_scale": 1.5,
                    "include_xyz": True,
                },
                "mlp_network_config": {
                    "otype": "VanillaMLP",
                    "activation": "ReLU",
                    "output_activation": "none",
                    "n_neurons": 16,
                    "n_hidden_layers": 1,
                    "sphere_init": True,
                    "sphere_init_radius": 0.5,
                    "weight_norm": True,
                },
            },
            "texture": {
                "name": "volume-radiance",
                "input_feature_dim": 11,
                "dir_encoding_config": {"otype": "SphericalHarmonics", "degree": 2},
                "mlp_network_config": {
                    "otype": "FullyFusedMLP",
                    "activation": "ReLU",
                    "output_activation": "none",
                    "n_neurons": 16,
                    "n_hidden_layers": 1,
                },
                "color_activation": "sigmoid",
            },
        }
    )
    model = models.make("neus", cfg)
    params = model.init(jax.random.PRNGKey(0))
    extra = model.init_extra_state()
    assert "prev_inv_s" in extra
    # snapshot keeps tracking raw inv_s until mod_start_steps, then freezes
    params2 = {**params, "variance": {"variance": jnp.float32(0.5)}}
    e1 = model.update_extra_state(params2, extra, jnp.int32(2))
    assert abs(float(e1["prev_inv_s"]) - float(np.exp(5.0))) < 1.0
    e2 = model.update_extra_state(params2, e1, jnp.int32(50))
    assert float(e2["prev_inv_s"]) == float(e1["prev_inv_s"])  # frozen
