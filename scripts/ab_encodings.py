"""A/B of xyz-encoding variants on the bench scene (real TPU).

For each variant: build the bench NeRF system with the encoding override,
train `--steps` steps, report steady-state step time, rays/s, and val PSNR
on the held-out procedural view. Grounds the TPU-tuned config choice
(PERF.md round 2): XLA's gather costs ~5 ns/row + ~14 GB/s marginal, so
fewer/wider taps (L8xF4, L4xF8) or fewer gathers entirely (VM) buy
near-linear encode-time wins at (to be measured) quality cost.

Usage: python scripts/ab_encodings.py [--steps 1500] [--variants base,l8f4,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

VARIANTS = {
    # reference tcnn config: 16 levels x 2 features, 8-byte rows
    "base": {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.447269237440378,
    },
    # same total features + params, half the taps, 16-byte rows
    "l8f4": {
        "otype": "HashGrid", "n_levels": 8, "n_features_per_level": 4,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 2.0,
    },
    # quarter taps, 32-byte rows
    "l4f8": {
        "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 8,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 5.04,
    },
    # TensoRF-style VM factorization: 18 taps/sample
    "vm": {
        "otype": "VectorMatrix", "n_components": 16,
        "plane_resolution": 512, "line_resolution": 2048, "n_scales": 2,
    },
    # CP line factorization: ZERO gathers, all MXU one-hot matmuls
    "cp": {
        "otype": "CP", "n_components": 64,
        "resolutions": [128, 2048], "n_features": 16,
    },
    "cp_big": {
        "otype": "CP", "n_components": 128,
        "resolutions": [64, 512, 4096], "n_features": 16,
    },
}


def build(enc_cfg):
    import bench

    system = bench.build_system()
    # rebuild with the encoding override
    from instant_nsr_pl_tpu.config import config_from_dict
    from instant_nsr_pl_tpu.registry import datasets, systems

    cfg = system.config
    cfg.model.geometry["xyz_encoding_config"] = dict(enc_cfg)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    return system, dm


def run_variant(name, steps):
    system, dm = build(VARIANTS[name])
    state = system.init_state(seed=0)

    t_start = time.perf_counter()
    for _ in range(160):
        state, metrics = system.train_step(state)
    float(metrics["train/loss"])
    warm = time.perf_counter() - t_start

    n_meas = 64
    t0 = time.perf_counter()
    for _ in range(n_meas):
        state, metrics = system.train_step(state)
    float(metrics["train/loss"])
    dt = (time.perf_counter() - t0) / n_meas

    for _ in range(steps - 160 - n_meas):
        state, metrics = system.train_step(state)
    float(metrics["train/loss"])

    from instant_nsr_pl_tpu.trainer import data_arrays

    val = data_arrays(dm.val)
    res = system.evaluate_image(state, 0, data=val)
    out = {
        "variant": name,
        "step_ms": round(dt * 1e3, 1),
        "rays_per_sec": round(system.active_num_rays / dt, 1),
        "val_psnr_at_steps": round(float(res["psnr"]), 2),
        "steps": steps,
        "warmup_s": round(warm, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--variants", default="base,l8f4,l4f8,vm")
    args = p.parse_args()
    for name in args.variants.split(","):
        run_variant(name.strip(), args.steps)


if __name__ == "__main__":
    main()
