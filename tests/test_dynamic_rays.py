"""Bucketed dynamic ray batching: ladder construction and host-side
adaptation from live-sample counts (the reference's EMA batching,
systems/nerf.py:93-95, restated for static shapes)."""

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import systems
import instant_nsr_pl_tpu.systems  # noqa: F401


def _system(dynamic=True, start=256, max_rays=8192, capacity=262144):
    cfg = config_from_dict(
        {
            "model": {
                "name": "nerf",
                "dynamic_ray_sampling": dynamic,
                "radius": 1.0,
                "num_samples_per_ray": 64,
                "train_num_rays": start,
                "max_train_num_rays": max_rays,
                "train_num_samples": capacity,
                "grid_prune": True,
                "learned_background": False,
                "geometry": {
                    "name": "volume-density",
                    "radius": 1.0,
                    "feature_dim": 8,
                    "density_activation": "trunc_exp",
                    "density_bias": -1,
                    "isosurface": {"resolution": 16, "chunk": 8192},
                    "xyz_encoding_config": {
                        "otype": "HashGrid",
                        "n_levels": 4,
                        "n_features_per_level": 2,
                        "log2_hashmap_size": 12,
                        "base_resolution": 4,
                        "per_level_scale": 1.5,
                    },
                    "mlp_network_config": {
                        "otype": "FullyFusedMLP",
                        "activation": "ReLU",
                        "output_activation": "none",
                        "n_neurons": 16,
                        "n_hidden_layers": 1,
                    },
                },
                "texture": {
                    "name": "volume-radiance",
                    "input_feature_dim": 8,
                    "dir_encoding_config": {"otype": "SphericalHarmonics", "degree": 2},
                    "mlp_network_config": {
                        "otype": "FullyFusedMLP",
                        "activation": "ReLU",
                        "output_activation": "Sigmoid",
                        "n_neurons": 16,
                        "n_hidden_layers": 1,
                    },
                },
            },
            "system": {
                "name": "nerf-system",
                "loss": {"lambda_rgb": 1.0},
                "optimizer": {"name": "AdamW", "args": {"lr": 0.01}},
                "scheduler": None,
            },
        }
    )
    return systems.make("nerf-system", cfg)


def test_ladder_construction():
    s = _system()
    assert s.ray_buckets == [256, 512, 1024, 2048, 4096, 8192]
    assert s.active_num_rays == 256


def test_adapt_grows_when_sparse():
    s = _system()
    # 256 rays producing 2048 live samples -> 8/ray -> desired ~29k rays,
    # capped at the top bucket
    assert s.adapt_num_rays(2048.0) == 8192


def test_adapt_shrinks_when_dense():
    s = _system()
    s.active_num_rays = 8192
    # 8192 rays x 96 live/ray = 786k >> capacity -> drop to a fitting bucket
    new = s.adapt_num_rays(8192 * 96.0)
    assert new < 8192
    assert new * 96 <= 0.9 * s.train_capacity


def test_adapt_stable_at_operating_point():
    s = _system()
    s.active_num_rays = 4096
    live = 4096 * 50.0  # 204k of 262k capacity: 4096 is the right bucket
    assert s.adapt_num_rays(live) == 4096


def test_disabled_keeps_max():
    s = _system(dynamic=False)
    assert s.active_num_rays == 8192
    assert s.adapt_num_rays(10.0) == 8192
