"""Training-throughput benchmark: rays/s on the Instant-NGP NeRF hot loop.

Runs the real jitted training step (hash encode -> MLP -> SH+MLP ->
occupancy-pruned packed compositing -> AdamW) at the reference's per-step
workload (8192 rays, 262144-sample packed capacity, 1024 max samples/ray —
configs/nerf-blender.yaml) on the procedural synthetic scene, and prints ONE
JSON line.

Baseline: the reference trains lego 20k steps in 279 s on one RTX 3090
(BASELINE.md), with the dynamic ray batch pinned at its 8192-ray cap for most
of the run -> ~587k rays/s. vs_baseline = our rays/s / 587k.
"""

from __future__ import annotations

import json
import time

import os

import jax
import jax.numpy as jnp

try:  # persistent compile cache: repeat runs skip the ~2 min TPU compiles
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

def _versions():
    """jax/jaxlib/libtpu version stamp for the JSON line, so cross-round
    perf deltas are attributable to toolchain bumps (round-3 VERDICT #8)."""
    out = {"jax": jax.__version__}
    try:
        import jaxlib

        out["jaxlib"] = jaxlib.__version__
    except Exception:
        pass
    try:
        from importlib import metadata

        for dist in ("libtpu", "libtpu-nightly"):
            try:
                out["libtpu"] = metadata.version(dist)
                break
            except metadata.PackageNotFoundError:
                pass
    except Exception:
        pass
    try:
        out["platform_version"] = jax.devices()[0].client.platform_version
    except Exception:
        pass
    return out


# RTX 3090 reference operating points (BASELINE.md): NeRF lego 20k steps in
# 279 s, NeuS (w/ masks) avg 11:44 = 704 s — both at the 8192-ray dynamic cap
BASELINE_RAYS_PER_SEC = 8192 * 20000 / 279.0
BASELINE_NEUS_RAYS_PER_SEC = 8192 * 20000 / 704.0

# a sparse multi-object scene whose live-samples-per-ray profile (~30-40)
# matches lego's, so dynamic ray batching settles near the reference's
# operating point (8192 rays x ~32 live samples ~ the 262144 budget)
_SPHERES = [
    [0.55, 0.0, 0.1, 0.16, 0.8, 0.3, 0.2],
    [-0.5, 0.3, -0.2, 0.14, 0.2, 0.7, 0.3],
    [0.1, -0.55, 0.3, 0.15, 0.25, 0.35, 0.9],
    [-0.2, -0.1, 0.55, 0.12, 0.9, 0.8, 0.2],
    [0.3, 0.5, -0.4, 0.13, 0.6, 0.2, 0.8],
    [-0.55, -0.45, 0.0, 0.12, 0.2, 0.8, 0.8],
]


# xyz-encoding choices for the bench NeRF (A/B'd in PERF.md, 1000 steps on
# the bench scene): the TPU-tuned flagship is the zero-gather CP encoding —
# 149k rays/s at 29.3 val PSNR vs the reference tcnn hash config's 19.7k
# rays/s at 28.0 PSNR (random gathers are the v5e cost floor; ops/cp.py).
# 'hash' keeps the exact reference configuration for parity measurements.
_ENCODINGS = {
    "cp": {
        "otype": "CP", "n_components": 64,
        "resolutions": [128, 2048], "n_features": 16,
    },
    "cp_big": {  # +1.4 dB over cp at ~2/3 the throughput (103k rays/s)
        "otype": "CP", "n_components": 128,
        "resolutions": [64, 512, 4096], "n_features": 16,
    },
    "cp_stacked": {  # nested resolutions -> stacked-scales fused kernel:
        # all scales in ONE full-MXU-width matmul per axis (cp_mlp_pallas)
        "otype": "CP", "n_components": 64,
        "resolutions": [129, 2049], "n_features": 16,
        "stack_scales": True,
    },
    "hash": {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.447269237440378,
    },
}


def _apply_smoke(cfg):
    """--smoke: shrink the workload so the full bench plumbing (A/B, warmup,
    measurement, JSON output) executes in seconds on CPU. Numbers produced
    under smoke are plumbing checks, not benchmarks."""
    if not os.environ.get("INSR_BENCH_SMOKE"):
        return cfg
    cfg.dataset["size"] = 48
    cfg.dataset["n_train"] = 4
    m = cfg.model
    m["num_samples_per_ray"] = 32
    if "num_samples_per_ray_bg" in m:
        m["num_samples_per_ray_bg"] = 16
    m["train_num_rays"] = 128
    m["max_train_num_rays"] = 128
    m["train_num_samples"] = 4096
    if "train_num_samples_bg" in m:
        m["train_num_samples_bg"] = 4096
    m["eval_chunk_rays"] = 512
    m["eval_num_samples"] = 8192
    if "eval_num_samples_bg" in m:
        m["eval_num_samples_bg"] = 8192
    enc = m.geometry["xyz_encoding_config"]
    if enc.get("otype") == "HashGrid":
        enc["n_levels"] = 6
        enc["log2_hashmap_size"] = 14
    return cfg


def build_system(encoding: str = "cp"):
    from instant_nsr_pl_tpu.config import config_from_dict
    from instant_nsr_pl_tpu.registry import datasets, systems
    import instant_nsr_pl_tpu.datasets  # noqa: F401
    import instant_nsr_pl_tpu.systems  # noqa: F401

    spheres = _SPHERES
    cfg = config_from_dict(
        {
            "dataset": {"name": "synthetic", "size": 256, "n_train": 8, "n_val": 1,
                        "spheres": spheres},
            "model": {
                "name": "nerf",
                # fixed at the reference's converged operating point (8192
                # rays); on this sparse scene live samples stay well under
                # capacity, so no rays are truncated and one compilation
                # suffices (dynamic bucketing would compile 4-5 variants)
                "dynamic_ray_sampling": False,
                "radius": 1.5,
                "num_samples_per_ray": 1024,
                "train_num_rays": 256,
                "max_train_num_rays": 8192,
                "train_num_samples": 262144,
                "eval_chunk_rays": 4096,
                "eval_num_samples": 262144,
                "grid_prune": True,
                "grid_warmup_steps": 16,  # hit the steady-state occ path
                "learned_background": False,
                "background_color": "random",
                "randomized": True,
                "batch_image_sampling": True,
                "geometry": {
                    "name": "volume-density",
                    "radius": 1.5,
                    "feature_dim": 16,
                    "density_activation": "trunc_exp",
                    "density_bias": -1,
                    "isosurface": {"resolution": 128, "chunk": 262144},
                    "xyz_encoding_config": dict(_ENCODINGS[encoding]),
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
    cfg = _apply_smoke(cfg)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    system.bench_dm = dm  # --mode eval renders dm.val
    return system


def build_neus_system(encoding: str = "cp"):
    """NeuS at the reference's per-step workload (configs/neus-blender.yaml:
    8192-ray cap, 262144-sample fg capacity, analytic gradients) on the same
    procedural scene — the reference's slower model family
    (/root/reference/README.md:100, 2.5x NeRF's step time).

    Default encoding is the TPU flagship CP (125.3k rays/s, vs_baseline 0.54;
    quality A/B-matched against hash at 1200 steps: val 30.86 vs 30.82 —
    PERF.md); `--encoding hash` keeps the reference tcnn config for parity
    (15.5k rays/s: second-order analytic grads through the gather-bound
    hash encode are the v5e worst case)."""
    from instant_nsr_pl_tpu.config import config_from_dict
    from instant_nsr_pl_tpu.registry import datasets, systems
    import instant_nsr_pl_tpu.datasets  # noqa: F401
    import instant_nsr_pl_tpu.systems  # noqa: F401

    enc_cfg = dict(_ENCODINGS[encoding])
    if encoding == "hash":  # neus-blender's hash differs from the nerf one
        enc_cfg.update(base_resolution=32, per_level_scale=1.3195079107728942)
    enc_cfg["include_xyz"] = True
    cfg = config_from_dict(
        {
            "dataset": {"name": "synthetic", "size": 256, "n_train": 8, "n_val": 1,
                        "spheres": _SPHERES},
            "model": {
                "name": "neus",
                "dynamic_ray_sampling": False,
                "radius": 1.5,
                "num_samples_per_ray": 1024,
                "train_num_rays": 256,
                "max_train_num_rays": 8192,
                "train_num_samples": 262144,
                "eval_chunk_rays": 4096,
                "eval_num_samples": 262144,
                "grid_prune": True,
                "grid_prune_occ_thre": 0.001,
                "grid_warmup_steps": 16,
                "cos_anneal_end": 20000,
                "learned_background": False,
                "background_color": "random",
                "randomized": True,
                "batch_image_sampling": True,
                "variance": {"init_val": 0.3, "modulate": False},
                "geometry": {
                    "name": "volume-sdf",
                    "radius": 1.5,
                    "feature_dim": 13,
                    "grad_type": "analytic",
                    "isosurface": {"resolution": 128, "chunk": 262144},
                    "xyz_encoding_config": enc_cfg,
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
                    "dir_encoding_config": {"otype": "SphericalHarmonics", "degree": 4},
                    "mlp_network_config": {
                        "otype": "FullyFusedMLP",
                        "activation": "ReLU",
                        "output_activation": "none",
                        "n_neurons": 64,
                        "n_hidden_layers": 2,
                    },
                    "color_activation": "sigmoid",
                },
            },
            "system": {
                "name": "neus-system",
                "loss": {
                    "lambda_rgb_mse": 10.0,
                    "lambda_rgb_l1": 0.0,
                    "lambda_mask": 0.0,
                    "lambda_eikonal": 0.1,
                    "lambda_curvature": 0.0,
                    "lambda_sparsity": 0.01,
                    "lambda_distortion": 0.0,
                    "lambda_distortion_bg": 0.0,
                    "lambda_opaque": 0.0,
                    "sparsity_scale": 1.0,
                },
                "optimizer": {
                    "name": "AdamW",
                    "args": {"lr": 0.01, "betas": [0.9, 0.99], "eps": 1.0e-15},
                },
                "scheduler": None,
            },
        }
    )
    cfg = _apply_smoke(cfg)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    system.bench_dm = dm  # --mode eval renders dm.val
    return system


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument(
        "--devices",
        default=None,
        help="data-parallel chip count ('all' or int); default single-device",
    )
    p.add_argument(
        "--workload",
        default=None,
        choices=("nerf", "neus"),
        help="nerf (headline) or neus (the reference's slower family); "
        "default runs BOTH — neus first, nerf last (one JSON line each; "
        "the driver parses the tail line, so the headline stays last)",
    )
    p.add_argument(
        "--mode",
        default="train",
        choices=("train", "eval"),
        help="train (default: training-step rays/s) or eval (full-image "
        "chunked render throughput after a short training warmup; "
        "vs_baseline uses the TRAIN baseline denominator — no published "
        "reference eval number exists)",
    )
    p.add_argument(
        "--encoding",
        default=None,
        choices=sorted(_ENCODINGS),
        help="xyz encoding: cp (TPU flagship; default for both workloads) | "
        "cp_big | hash (reference tcnn config, for parity)",
    )
    p.add_argument(
        "--platform",
        default=None,
        help="pin the JAX platform (e.g. 'cpu' for smoke runs); set via "
        "jax.config because JAX_PLATFORMS can be overridden by site plugins",
    )
    p.add_argument(
        "--smoke",
        action="store_true",
        help="shrink the workload + step counts so the full bench plumbing "
        "runs in seconds on CPU (plumbing check, NOT a benchmark)",
    )
    p.add_argument(
        "--no-ab",
        action="store_true",
        help="skip the fused-vs-composed kernel A/B (train mode runs it by "
        "default when the fused Pallas path is active: the fused kernels "
        "are backend-sensitive, so an unattended bench keeps whichever "
        "path measures faster)",
    )
    args, _ = p.parse_known_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.smoke:
        os.environ["INSR_BENCH_SMOKE"] = "1"
    workloads = [args.workload] if args.workload else ["neus", "nerf"]
    _AB_ENV = ("INSR_DISABLE_FUSED", "INSR_DISABLE_FUSED_SH")
    for workload in workloads:
        # A/B- and fallback-driven env mutations (incl. the fused-compile
        # fallback) must not leak into the next workload, even when this
        # one raises mid-run
        saved = {k: os.environ.get(k) for k in _AB_ENV}
        try:
            run_workload(args, workload)
        except Exception:  # noqa: BLE001 — one workload must not kill the rest
            if workload == workloads[-1]:
                raise
            import traceback

            traceback.print_exc()
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


def run_workload(args, workload):
    smoke = bool(os.environ.get("INSR_BENCH_SMOKE"))
    warm_steps, meas_steps = (16, 8) if smoke else (160, 96)
    # A/B arms: 96 measured steps each, timed as 3 chunks whose per-step
    # MEDIAN decides (round-2 VERDICT #8: 32-step wall-clocks flipped on
    # occ-update amortization noise)
    ab_warm, ab_chunk, ab_chunks = (8, 8, 1) if smoke else (48, 32, 3)

    def build():
        if workload == "neus":
            system = build_neus_system(encoding=args.encoding or "cp")
        else:
            system = build_system(encoding=args.encoding or "cp")
        if args.devices is not None:
            n = len(jax.devices()) if args.devices == "all" else int(args.devices)
            if n > 1:
                from instant_nsr_pl_tpu.parallel import make_mesh

                system.configure_parallel(make_mesh(n))
        return system, system.init_state(seed=0)

    def _uses_fused(sys_):
        mdl = sys_.model
        for name in ("geometry", "geometry_bg"):
            ewn = getattr(getattr(mdl, name, None), "encoding_with_network", None)
            if ewn is not None and getattr(ewn, "fused", False):
                return True
        for name in ("texture", "texture_bg"):
            if getattr(getattr(mdl, name, None), "fused", False):
                return True
        return False

    system, state = build()
    # First dispatch compiles everything. If a fused Pallas path fails at
    # REAL Mosaic compile time (the CPU lowering tests can't see backend
    # limits like VMEM pressure), fall back to the composed kernels so an
    # unattended bench still reports a number instead of crashing. The
    # failure is retried ONCE on the same path first: transient tunnel
    # errors (BENCH_r03's `remote_compile: response body closed`) must not
    # silently demote the fused path — the persistent compile cache makes
    # the retry cheap. A real fallback is recorded in the JSON line.
    fused_fallback_exc = None
    transient_left, same_path_left, on_fallback = 4, 1, False
    while True:
        try:
            state, metrics = system.train_chunk(state, 1)
            float(metrics["train/loss"])
            break
        except Exception as e:  # noqa: BLE001 — unattended-run safety net
            import sys
            import time as _time
            import traceback

            traceback.print_exc()
            msg = str(e)
            # tunnel/infra failures (observed: `remote_compile: response
            # body closed`, INTERNAL, UNAVAILABLE — three in a row killed
            # the round-5 neus arm) are NOT kernel problems: retry the
            # SAME path with backoff instead of demoting to composed
            # NOTE: deliberately NOT matching bare "INTERNAL" — deterministic
            # Mosaic kernel-compile failures also surface as INTERNAL, and
            # those must demote to composed, not burn backoff retries
            transient = any(
                s in msg
                for s in ("remote_compile", "UNAVAILABLE", "DEADLINE",
                          "body closed", "Socket closed")
            )
            if transient and transient_left > 0:
                transient_left -= 1
                print(
                    f"bench: transient infra error ({type(e).__name__}); "
                    f"retrying in 30s ({transient_left} retries left)",
                    file=sys.stderr,
                )
                _time.sleep(30)
                system, state = build()
                continue
            if same_path_left > 0:
                same_path_left -= 1
                print(
                    f"bench: first dispatch failed ({type(e).__name__}); "
                    "retrying same path once",
                    file=sys.stderr,
                )
                system, state = build()
                continue
            if on_fallback:
                raise
            if _uses_fused(system):
                fused_fallback_exc = type(e).__name__
            os.environ["INSR_DISABLE_FUSED"] = "1"
            on_fallback, transient_left, same_path_left = True, 2, 0
            print(
                "bench: falling back to INSR_DISABLE_FUSED=1",
                file=sys.stderr,
            )
            system, state = build()

    if args.mode == "eval":
        from instant_nsr_pl_tpu.trainer import data_arrays

        # short training warmup so the occupancy grid converges and eval
        # measures a realistic packing (not an all-empty scene)
        state, metrics = system.train_chunk(state, 16 if smoke else 64)
        float(metrics["train/loss"])
        dm = system.bench_dm
        val = data_arrays(dm.val)
        h, w = int(val["images"].shape[1]), int(val["images"].shape[2])
        system.render_image(state, 0, data=val)  # compile + warm
        n_imgs = 1 if smoke else 6
        t0 = time.perf_counter()
        for _ in range(n_imgs):
            system.render_image(state, 0, data=val)
        dt = time.perf_counter() - t0  # render_image returns numpy: synced
        rays_per_sec = h * w * n_imgs / dt
        baseline = (
            BASELINE_NEUS_RAYS_PER_SEC
            if workload == "neus"
            else BASELINE_RAYS_PER_SEC
        )
        print(
            json.dumps(
                {
                    "metric": f"eval_rays_per_sec_{workload}",
                    "value": round(rays_per_sec, 1),
                    "unit": "rays/s",
                    "vs_baseline": round(rays_per_sec / baseline, 4),
                }
            )
        )
        return

    def _time_steps(sys_, st, warm, chunk, chunks):
        """Median per-step time over ``chunks`` timed chunks of ``chunk``
        steps each (occ-update amortization makes single wall-clocks noisy;
        the median chunk is stable across runs — round-2 VERDICT #8)."""
        st, m = sys_.train_chunk(st, warm)
        float(m["train/loss"])
        times = []
        for _ in range(chunks):
            t0 = time.perf_counter()
            st, m = sys_.train_chunk(st, chunk)
            float(m["train/loss"])
            times.append((time.perf_counter() - t0) / chunk)
        times.sort()
        return times[len(times) // 2], st

    ab_report = None
    fused_was_disabled = bool(os.environ.get("INSR_DISABLE_FUSED"))
    if not args.no_ab and not fused_was_disabled and _uses_fused(system):
        import sys as _sys

        # three arms: everything fused / only the density head fused (the
        # TPU microbench has the fused radiance slightly SLOWER than
        # composed) / everything composed. Keep whichever measures fastest.
        dt_fused, state = _time_steps(system, state, ab_warm, ab_chunk, ab_chunks)
        arms = {"fused": (dt_fused, system, state)}

        def _radiance_fused(sys_):
            return any(
                getattr(getattr(sys_.model, n, None), "fused", False)
                for n in ("texture", "texture_bg")
            )

        def _density_fused(sys_):
            return any(
                getattr(
                    getattr(getattr(sys_.model, n, None),
                            "encoding_with_network", None),
                    "fused", False,
                )
                for n in ("geometry", "geometry_bg")
            )

        arm_list = [("composed", "INSR_DISABLE_FUSED")]
        if _radiance_fused(system) and _density_fused(system):
            # only meaningful when BOTH heads are fused: with the radiance
            # head unfused it duplicates the fused arm, with the density
            # head unfused it duplicates the composed arm
            arm_list.insert(0, ("density_only", "INSR_DISABLE_FUSED_SH"))
        for arm_name, env in arm_list:
            os.environ[env] = "1"
            try:
                sys_b, st_b = build()
                st_b, m = sys_b.train_chunk(st_b, 1)
                float(m["train/loss"])
                dt_b, st_b = _time_steps(sys_b, st_b, ab_warm, ab_chunk, ab_chunks)
                arms[arm_name] = (dt_b, sys_b, st_b)
            except Exception:  # noqa: BLE001 — an arm must not kill the bench
                pass
            finally:
                os.environ.pop(env, None)
        picked = min(arms, key=lambda k: arms[k][0])
        print(
            f"bench A/B ({workload}): "
            + " vs ".join(
                f"{k} {v[0] * 1e3:.2f} ms/step" for k, v in arms.items()
            )
            + f" -> {picked} (median of {ab_chunks}x{ab_chunk}-step chunks)",
            file=_sys.stderr,
        )
        ab_report = {
            f"{k}_ms_per_step": round(v[0] * 1e3, 3) for k, v in arms.items()
        }
        ab_report["picked"] = picked
        _, system, state = arms[picked]
        if picked == "composed":
            os.environ["INSR_DISABLE_FUSED"] = "1"
        elif picked == "density_only":
            os.environ["INSR_DISABLE_FUSED_SH"] = "1"

    # warm up: compile both occ-update variants + the scan-megastep chunk
    # (train_chunk: one dispatch per grid-update interval — the production
    # loop in trainer.py), let the occupancy grid converge so steady-state
    # packing is measured, and let dynamic ray batching settle on its bucket
    # (training spends 98%+ of its steps there)
    state, metrics = system.train_chunk(state, warm_steps)
    float(metrics["train/loss"])  # fetch = the only true sync on this runtime

    n_steps = meas_steps
    t0 = time.perf_counter()
    state, metrics = system.train_chunk(state, n_steps)
    float(metrics["train/loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = system.active_num_rays * n_steps / dt
    baseline = (
        BASELINE_NEUS_RAYS_PER_SEC
        if workload == "neus"
        else BASELINE_RAYS_PER_SEC
    )
    line = {
        "metric": f"train_rays_per_sec_{workload}"
        if workload != "nerf"
        else "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4),
        # whether the MEASURED path ran any fused Pallas head (round-3
        # VERDICT: a fallback must be visible in the line, not silent)
        "fused": bool(
            _uses_fused(system) and not os.environ.get("INSR_DISABLE_FUSED")
        ),
        "versions": _versions(),
    }
    if fused_fallback_exc is not None:
        line["fused_fallback_exc"] = fused_fallback_exc
    if ab_report is not None:
        line["ab"] = ab_report
    print(json.dumps(line), flush=True)
    # env restoration across workloads happens in main()'s finally


if __name__ == "__main__":
    main()
