"""Checkpoint round-trip: full state (params, optimizer, occupancy grids,
extra state, step, rng) restores exactly; weights-only keeps params+occ but
resets the optimizer; mismatched templates fail loudly."""

import jax
import numpy as np
import pytest

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import datasets, systems
import instant_nsr_pl_tpu.datasets  # noqa: F401
import instant_nsr_pl_tpu.systems  # noqa: F401
from instant_nsr_pl_tpu.utils.checkpoint import (
    load_checkpoint,
    load_weights_only,
    save_checkpoint,
)


def _make_system():
    cfg = config_from_dict(
        {
            "dataset": {"name": "synthetic", "size": 32, "n_train": 2, "n_val": 1},
            "model": {
                "name": "nerf",
                "dynamic_ray_sampling": False,
                "radius": 1.0,
                "num_samples_per_ray": 32,
                "train_num_rays": 64,
                "max_train_num_rays": 64,
                "train_num_samples": 1024,
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
    dm = datasets.make("synthetic", cfg.dataset)
    dm.setup("fit")
    s = systems.make("nerf-system", cfg)
    s.setup_data(dm.train)
    return s


def _trained_state(s, n=10):
    state = s.init_state(seed=0)
    for _ in range(n):
        state, _ = s.train_step(state)
    return state


def test_full_roundtrip_exact(tmp_path):
    s = _make_system()
    state = _trained_state(s)
    path = save_checkpoint(str(tmp_path / "ck.npz"), state)

    template = s.init_state(seed=1)
    restored = load_checkpoint(path, template)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored state continues training bit-identically to the original
    s._host_step = None
    st1, m1 = s.train_step(state)
    s._host_step = None
    st2, m2 = s.train_step(restored)
    np.testing.assert_array_equal(
        np.asarray(m1["train/loss"]), np.asarray(m2["train/loss"])
    )


def test_weights_only_resets_optimizer(tmp_path):
    s = _make_system()
    state = _trained_state(s)
    path = save_checkpoint(str(tmp_path / "ck.npz"), state)

    template = s.init_state(seed=1)
    restored = load_weights_only(path, template)
    # params copied from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(restored["params"])[0]),
    )
    # step/optimizer stay fresh
    assert int(restored["step"]) == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(template["opt_state"])[0]),
        np.asarray(jax.tree_util.tree_leaves(restored["opt_state"])[0]),
    )


def test_template_mismatch_fails_loudly(tmp_path):
    s = _make_system()
    state = _trained_state(s, n=2)
    path = save_checkpoint(str(tmp_path / "ck.npz"), state)
    bad_template = {"params": state["params"]}  # wrong structure
    with pytest.raises(ValueError):
        load_checkpoint(path, bad_template)
