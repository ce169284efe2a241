"""Driver entry points: single-chip compile check + multi-chip dry run.

``entry()`` returns a jittable forward step on the flagship NeRF renderer
plus example args. ``dryrun_multichip(n)`` builds an n-device data-parallel
mesh, jits the FULL training step (sharded rays, pmean'd grads, collective
occupancy update) and executes one real step on tiny shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nerf_config(tiny: bool = True):
    from instant_nsr_pl_tpu.config import config_from_dict

    return config_from_dict(
        {
            "dataset": {"name": "synthetic", "size": 32, "n_train": 4, "n_val": 1},
            "model": {
                "name": "nerf",
                "radius": 1.0,
                "num_samples_per_ray": 64,
                "train_num_rays": 64,
                "max_train_num_rays": 512,
                "train_num_samples": 8192,
                "eval_chunk_rays": 512,
                "eval_num_samples": 16384,
                "grid_prune": True,
                "learned_background": False,
                "background_color": "random",
                "randomized": True,
                "batch_image_sampling": True,
                "geometry": {
                    "name": "volume-density",
                    "radius": 1.0,
                    "feature_dim": 16,
                    "density_activation": "trunc_exp",
                    "density_bias": -1,
                    "isosurface": {"resolution": 32, "chunk": 32768},
                    "xyz_encoding_config": {
                        "otype": "HashGrid",
                        "n_levels": 8,
                        "n_features_per_level": 2,
                        "log2_hashmap_size": 15,
                        "base_resolution": 16,
                        "per_level_scale": 1.447269237440378,
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
                    "dir_encoding_config": {"otype": "SphericalHarmonics", "degree": 4},
                    "mlp_network_config": {
                        "otype": "FullyFusedMLP",
                        "activation": "ReLU",
                        "output_activation": "Sigmoid",
                        "n_neurons": 64,
                        "n_hidden_layers": 2,
                    },
                },
            },
            "system": {
                "name": "nerf-system",
                "loss": {"lambda_rgb": 1.0, "lambda_distortion": 0.0},
                "optimizer": {
                    "name": "AdamW",
                    "args": {"lr": 0.01, "betas": [0.9, 0.99], "eps": 1.0e-15},
                },
                "scheduler": None,
            },
        }
    )


def entry():
    """(fn, example_args): jittable NeRF render step, single chip."""
    from instant_nsr_pl_tpu.registry import models
    import instant_nsr_pl_tpu.models  # noqa: F401  (register)

    cfg = _nerf_config()
    model = models.make(cfg.model.name, cfg.model)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng)
    occ = model.init_occupancy()
    # mark everything occupied so the forward touches the full pipeline
    grid = occ["grid"]
    occ = {"grid": grid._replace(binary=jnp.ones_like(grid.binary))}

    n_rays = 1024
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    rays_o = jnp.zeros((n_rays, 3)).at[:, 2].set(-2.5)
    d = jax.random.normal(k1, (n_rays, 3)) * 0.1 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def fn(params, occ, rays_o, rays_d):
        out = model.forward(
            params,
            occ,
            rays_o,
            rays_d,
            background_color=jnp.ones((3,), jnp.float32),
            capacity=16384,
            rng=None,
            step=None,
            randomized=False,
            train=False,
        )
        return out["comp_rgb"]

    return fn, (params, occ, rays_o, rays_d)


def dryrun_multichip(n_devices: int) -> None:
    """One data-parallel training step over an ``n_devices`` mesh: rays
    sharded, grads pmean'd over ICI, collective occupancy update."""
    from instant_nsr_pl_tpu.registry import datasets, systems
    import instant_nsr_pl_tpu.datasets  # noqa: F401
    import instant_nsr_pl_tpu.systems  # noqa: F401
    from instant_nsr_pl_tpu.parallel import make_mesh

    cfg = _nerf_config()
    # keep per-device shapes tiny but divisible
    cfg.model["max_train_num_rays"] = 16 * n_devices
    cfg.model["train_num_samples"] = 256 * n_devices

    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    mesh = make_mesh(n_devices)
    system.configure_parallel(mesh)
    state = system.init_state(seed=0)
    state, metrics = system.train_step(state)  # occ warmup + sharded step
    jax.block_until_ready(metrics["train/loss"])
    loss = float(metrics["train/loss"])
    assert np.isfinite(loss), f"non-finite loss {loss} in multichip dryrun"


if __name__ == "__main__":
    fn, args = entry()
    out = jax.jit(fn)(*args)
    print("entry forward:", out.shape, float(out.mean()))
    n = len(jax.devices())
    dryrun_multichip(n)
    print(f"dryrun_multichip({n}) OK")
