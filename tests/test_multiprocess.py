"""Multi-process (multi-host analog) integration test.

Spawns 2 OS processes, each with 4 virtual CPU devices, connected via
``jax.distributed.initialize`` into one 8-device global mesh — the
multi-controller analog of an N-host pod slice (reference role: torch DDP
over NCCL, launch.py:98). Both ranks run the shard_map DP training plan;
the test asserts ranks agree on losses/params and that a single-process
8-device run at matched RNG produces the same parameters.
"""

import os
import socket
import subprocess
import sys
import json

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys

sys.path.insert(0, os.environ["NSR_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from instant_nsr_pl_tpu.parallel.distributed import maybe_initialize_distributed
maybe_initialize_distributed()  # from NSR_* env vars; no-op single-process

import jax.numpy as jnp
import numpy as np
from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import datasets, systems
import instant_nsr_pl_tpu.datasets  # noqa: F401
import instant_nsr_pl_tpu.systems  # noqa: F401
from instant_nsr_pl_tpu.parallel import make_mesh

cfg = config_from_dict(json.loads(os.environ["NSR_TEST_CFG"]))
dm = datasets.make(cfg.dataset.name, cfg.dataset)
dm.setup("fit")
system = systems.make(cfg.system.name, cfg)
system.setup_data(dm.train)
mesh = make_mesh()  # all 8 global devices
plan = system.configure_parallel(mesh)
state = system.init_state(seed=0)

losses = []
for _ in range(4):
    state, metrics = system.train_step(state)
    losses.append(float(metrics["train/loss"]))

checksum = float(
    sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(state["params"]))
)
print("RESULT " + json.dumps({
    "rank": jax.process_index(),
    "nproc": jax.process_count(),
    "ndev": len(jax.devices()),
    "losses": losses,
    "checksum": checksum,
}), flush=True)
"""


def _tiny_cfg():
    return {
        "dataset": {"name": "synthetic", "size": 48, "n_train": 4, "n_val": 1},
        "model": {
            "name": "nerf",
            "dynamic_ray_sampling": False,
            "radius": 1.0,
            "num_samples_per_ray": 32,
            "train_num_rays": 64,
            "max_train_num_rays": 256,
            "train_num_samples": 2048,
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
                "isosurface": {"resolution": 16, "chunk": 8192},
                "xyz_encoding_config": {
                    "otype": "HashGrid",
                    "n_levels": 4,
                    "n_features_per_level": 2,
                    "log2_hashmap_size": 12,
                    "base_resolution": 16,
                    "per_level_scale": 1.447269237440378,
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
                "input_feature_dim": 16,
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
            "loss": {"lambda_rgb": 1.0, "lambda_distortion": 0.0},
            "optimizer": {
                "name": "AdamW",
                "args": {"lr": 0.01, "betas": [0.9, 0.99], "eps": 1.0e-15},
            },
            "scheduler": None,
        },
    }


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_worker(env_extra, n_local_devices, timeout=600):
    env = dict(os.environ)
    for k in list(env):
        if k.startswith(("TPU_", "MEGASCALE_", "NSR_")):
            del env[k]
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["NSR_REPO"] = REPO
    env["NSR_TEST_CFG"] = json.dumps(_tiny_cfg())
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-c", WORKER],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _parse(out):
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"worker produced no RESULT line:\n{out[-4000:]}")


def test_two_process_dp_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    workers = [
        _run_worker(
            {
                "NSR_COORDINATOR": coord,
                "NSR_NUM_PROCESSES": "2",
                "NSR_PROCESS_ID": str(i),
            },
            n_local_devices=4,
        )
        for i in range(2)
    ]
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=900)
        outs.append(out)
        assert w.returncode == 0, out[-4000:]
    r0, r1 = (_parse(o) for o in outs)
    assert r0["nproc"] == 2 and r0["ndev"] == 8
    assert {r0["rank"], r1["rank"]} == {0, 1}

    # both controllers observe identical replicated results
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    np.testing.assert_allclose(r0["checksum"], r1["checksum"], rtol=1e-6)

    # single-process 8-device run at matched RNG reproduces the parameters
    single = _run_worker({}, n_local_devices=8)
    out, _ = single.communicate(timeout=900)
    assert single.returncode == 0, out[-4000:]
    rs = _parse(out)
    assert rs["nproc"] == 1 and rs["ndev"] == 8
    np.testing.assert_allclose(rs["losses"], r0["losses"], rtol=1e-4)
    np.testing.assert_allclose(rs["checksum"], r0["checksum"], rtol=1e-4)
