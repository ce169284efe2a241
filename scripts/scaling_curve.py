"""DP weak-scaling curve on the virtual CPU mesh (1/2/4/8 devices).

The real pod slice isn't reachable from this image (one tunneled chip),
so this measures the *structure* of the data-parallel plan instead: a
fixed per-device workload (global rays/capacity scale with the mesh)
should hold step time roughly flat as devices are added — a strongly
rising step-time curve means the plan is serializing something that
should be sharded (the regression this script exists to catch; the
pmean'd gradients and the all-gathered occupancy update are the usual
suspects). CPU "devices" share the same physical cores, so wall-clock
efficiency here is NOT a TPU prediction — read the shape, not the
absolute numbers.

Run: python scripts/scaling_curve.py [--steps 24] [--rays-per-dev 256]

Reference role: the DDP scaling claim (reference launch.py:98; SURVEY.md
§2c "≥80% rays/s scaling"), checked on the only mesh available in-image.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import datasets, systems
import instant_nsr_pl_tpu.datasets  # noqa: F401
import instant_nsr_pl_tpu.systems  # noqa: F401
from instant_nsr_pl_tpu.parallel import make_mesh


# --encoding choices: the CP flagship, and the REFERENCE hash config
# (L16 F2 2^19 — the gather-bound workload whose single-chip ceiling is
# documented in PERF.md; DP is its prescribed scaling recipe, so its
# weak-scaling shape is first-class evidence)
_ENCODINGS = {
    "cp": {
        "otype": "CP", "n_components": 32,
        "resolutions": [64, 256], "n_features": 16,
    },
    "hash": {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.447269237440378,
    },
}


def _cfg(n_rays: int, samples_per_ray: int, encoding: str = "cp"):
    return config_from_dict(
        {
            "dataset": {"name": "synthetic", "size": 64, "n_train": 8, "n_val": 1},
            "model": {
                "name": "nerf",
                "dynamic_ray_sampling": False,
                "radius": 1.0,
                "num_samples_per_ray": samples_per_ray,
                "train_num_rays": n_rays,
                "max_train_num_rays": n_rays,
                "train_num_samples": n_rays * samples_per_ray // 4,
                "eval_chunk_rays": 1024,
                "eval_num_samples": 65536,
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
                    "isosurface": {"resolution": 32, "chunk": 65536},
                    "xyz_encoding_config": dict(_ENCODINGS[encoding]),
                    "mlp_network_config": {
                        "otype": "FullyFusedMLP",
                        "activation": "ReLU",
                        "output_activation": "none",
                        "n_neurons": 32,
                        "n_hidden_layers": 1,
                    },
                },
                "texture": {
                    "name": "volume-radiance",
                    "input_feature_dim": 16,
                    "dir_encoding_config": {
                        "otype": "SphericalHarmonics",
                        "degree": 2,
                    },
                    "mlp_network_config": {
                        "otype": "FullyFusedMLP",
                        "activation": "ReLU",
                        "output_activation": "Sigmoid",
                        "n_neurons": 32,
                        "n_hidden_layers": 1,
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


def run_point(
    n_dev: int, rays_per_dev: int, samples_per_ray: int, steps: int,
    encoding: str = "cp",
):
    cfg = _cfg(rays_per_dev * n_dev, samples_per_ray, encoding)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    if n_dev > 1:
        system.configure_parallel(make_mesh(n_dev))
    state = system.init_state(seed=0)

    state, metrics = system.train_chunk(state, 17)  # compile + warm occ paths
    float(metrics["train/loss"])
    t0 = time.perf_counter()
    state, metrics = system.train_chunk(state, steps)
    float(metrics["train/loss"])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--rays-per-dev", type=int, default=256)
    ap.add_argument("--samples-per-ray", type=int, default=64)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--encoding", default="cp", choices=sorted(_ENCODINGS))
    args = ap.parse_args()

    results = {}
    base = None
    for n_dev in [int(d) for d in args.devices.split(",")]:
        if n_dev > len(jax.devices()):
            print(f"skip {n_dev} devices (only {len(jax.devices())})")
            continue
        dt = run_point(
            n_dev, args.rays_per_dev, args.samples_per_ray, args.steps,
            args.encoding,
        )
        if base is None:
            base = dt
        results[n_dev] = {
            "step_ms": round(dt * 1e3, 2),
            "rays_per_sec": round(args.rays_per_dev * n_dev / dt),
            "weak_efficiency": round(base / dt, 3),
        }
        print(f"devices={n_dev}: {json.dumps(results[n_dev])}")
    print(json.dumps({"scaling_curve": results}))


if __name__ == "__main__":
    main()
