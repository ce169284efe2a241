"""Systems-layer tests: scheduled scalars, optimizer/scheduler factory
(parity vs torch's scheduler zoo), and short end-to-end training smoke runs
on the procedural synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import datasets, systems
import instant_nsr_pl_tpu.datasets  # noqa: F401
import instant_nsr_pl_tpu.systems  # noqa: F401
from instant_nsr_pl_tpu.systems.base import C
from instant_nsr_pl_tpu.systems.optimizers import make_factor_schedule


# ---------------------------------------------------------------------------
# C() scheduled scalars (reference systems/base.py:28-45)
# ---------------------------------------------------------------------------


def test_scheduled_scalar():
    assert float(C(0.5, 0)) == 0.5
    spec = [100, 0.0, 1.0, 200]
    assert float(C(spec, 0)) == 0.0
    assert float(C(spec, 100)) == 0.0
    assert abs(float(C(spec, 150)) - 0.5) < 1e-6
    assert float(C(spec, 200)) == 1.0
    assert float(C(spec, 500)) == 1.0
    # 3-element form prepends start_step=0
    assert abs(float(C([1.0, 0.0, 10], 5)) - 0.5) < 1e-6


def test_scheduled_scalar_rejects_epoch_interpolation_without_length():
    """A float end_step selects the reference's epoch interpolation
    (reference systems/base.py:40-44); without a dataset length there is
    nothing to translate epochs->steps against — rejected loudly."""
    with pytest.raises(ValueError, match="epoch"):
        C([100, 0.0, 1.0, 200.0], 0)


def test_scheduled_scalar_epoch_translation():
    """Float end_step + epoch_steps: interpolation by the INTEGER epoch
    counter (reference systems/base.py:41-44 uses self.current_epoch), so
    the value is a step function — constant within each epoch, including
    mid-epoch steps."""
    spec = [1.0, 0.0, 1.0, 3.0]  # epochs 1..3
    es = 100
    assert float(C(spec, 0, epoch_steps=es)) == 0.0
    assert float(C(spec, 100, epoch_steps=es)) == 0.0
    assert float(C(spec, 150, epoch_steps=es)) == 0.0  # mid-epoch: constant
    assert abs(float(C(spec, 200, epoch_steps=es)) - 0.5) < 1e-6
    assert abs(float(C(spec, 250, epoch_steps=es)) - 0.5) < 1e-6
    assert float(C(spec, 300, epoch_steps=es)) == 1.0
    assert float(C(spec, 999, epoch_steps=es)) == 1.0


# ---------------------------------------------------------------------------
# scheduler zoo parity vs torch (the reference drives torch schedulers,
# systems/utils.py:12-346)
# ---------------------------------------------------------------------------


def _torch_factors(sched_ctor, steps):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = sched_ctor(opt)
    out = []
    for _ in range(steps):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(out)


@pytest.mark.parametrize(
    "cfg,ctor",
    [
        (
            {"name": "MultiStepLR", "args": {"milestones": [5, 8], "gamma": 0.1}},
            lambda o: __import__("torch").optim.lr_scheduler.MultiStepLR(
                o, milestones=[5, 8], gamma=0.1
            ),
        ),
        (
            {"name": "ExponentialLR", "args": {"gamma": 0.9}},
            lambda o: __import__("torch").optim.lr_scheduler.ExponentialLR(o, 0.9),
        ),
        (
            {
                "name": "LinearLR",
                "args": {"start_factor": 0.01, "end_factor": 1.0, "total_iters": 6},
            },
            lambda o: __import__("torch").optim.lr_scheduler.LinearLR(
                o, start_factor=0.01, end_factor=1.0, total_iters=6
            ),
        ),
        (
            {"name": "ConstantLR", "args": {"factor": 0.25, "total_iters": 4}},
            lambda o: __import__("torch").optim.lr_scheduler.ConstantLR(
                o, factor=0.25, total_iters=4
            ),
        ),
        (
            {"name": "StepLR", "args": {"step_size": 3, "gamma": 0.5}},
            lambda o: __import__("torch").optim.lr_scheduler.StepLR(
                o, step_size=3, gamma=0.5
            ),
        ),
    ],
)
def test_factor_schedule_matches_torch(cfg, ctor):
    ours = make_factor_schedule(config_from_dict(cfg))
    torch_lrs = _torch_factors(ctor, 12)
    our_lrs = np.array([float(ours(s)) for s in range(12)])
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-7)


def test_sequential_schedule_matches_torch():
    import torch

    cfg = config_from_dict(
        {
            "name": "SequentialLR",
            "milestones": [5],
            "schedulers": [
                {
                    "name": "LinearLR",
                    "args": {"start_factor": 0.01, "end_factor": 1.0, "total_iters": 5},
                },
                {"name": "ExponentialLR", "args": {"gamma": 0.8}},
            ],
        }
    )
    ours = make_factor_schedule(cfg)

    def ctor(o):
        s1 = torch.optim.lr_scheduler.LinearLR(
            o, start_factor=0.01, end_factor=1.0, total_iters=5
        )
        s2 = torch.optim.lr_scheduler.ExponentialLR(o, 0.8)
        return torch.optim.lr_scheduler.SequentialLR(
            o, schedulers=[s1, s2], milestones=[5]
        )

    torch_lrs = _torch_factors(ctor, 15)
    our_lrs = np.array([float(ours(s)) for s in range(15)])
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-7)


def test_epoch_interval_schedule_matches_torch_per_epoch_stepping():
    """interval: epoch (reference systems/utils.py:328-346 with torch
    semantics: scheduler.step() once per epoch) translated onto the
    step-based loop via floor(step / steps_per_epoch)."""
    import torch

    epoch_steps = 7
    cfg = config_from_dict(
        {
            "name": "ExponentialLR",
            "interval": "epoch",
            "args": {"gamma": 0.9},
        }
    )
    ours = make_factor_schedule(cfg, epoch_steps=epoch_steps)
    torch_lrs = _torch_factors(
        lambda o: torch.optim.lr_scheduler.ExponentialLR(o, 0.9), 5
    )
    for step in range(5 * epoch_steps):
        epoch = step // epoch_steps
        np.testing.assert_allclose(
            float(ours(step)), torch_lrs[epoch], rtol=1e-5, atol=1e-7
        )


def test_epoch_interval_without_length_rejected():
    cfg = config_from_dict(
        {"name": "ExponentialLR", "interval": "epoch", "args": {"gamma": 0.9}}
    )
    with pytest.raises(ValueError, match="epoch"):
        make_factor_schedule(cfg)


# ---------------------------------------------------------------------------
# end-to-end smoke runs
# ---------------------------------------------------------------------------


def _nerf_config(size=64):
    return config_from_dict(
        {
            "dataset": {"name": "synthetic", "size": size, "n_train": 12, "n_val": 1},
            "model": {
                "name": "nerf",
                "dynamic_ray_sampling": False,
                "radius": 1.0,
                "num_samples_per_ray": 96,
                "train_num_rays": 64,
                "max_train_num_rays": 1024,
                "train_num_samples": 16384,
                "eval_chunk_rays": 2048,
                "eval_num_samples": 131072,
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
                    "xyz_encoding_config": {
                        "otype": "HashGrid",
                        "n_levels": 8,
                        "n_features_per_level": 2,
                        "log2_hashmap_size": 16,
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
                "scheduler": {
                    "name": "MultiStepLR",
                    "interval": "step",
                    "args": {"milestones": [300, 400], "gamma": 0.33},
                },
            },
        }
    )


def test_nerf_system_trains():
    cfg = _nerf_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    state = system.init_state(seed=0)

    first_metrics = None
    for _ in range(120):
        state, metrics = system.train_step(state)
        if first_metrics is None:
            first_metrics = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(last["train/loss"])
    assert last["train/loss"] < first_metrics["train/loss"]
    assert last["train/psnr"] > first_metrics["train/psnr"]
    assert last["train/psnr"] > 15.0, last

    # validation render on the val split
    val = dm.val
    system_val_data = {
        "images": jnp.asarray(val.all_images),
        "fg_masks": jnp.asarray(val.all_fg_masks),
        "c2w": jnp.asarray(val.all_c2w),
        "directions": jnp.asarray(val.directions),
    }
    res = system.evaluate_image(state, 0, data=system_val_data)
    assert res["images"]["comp_rgb"].shape == (64, 64, 3)
    assert np.isfinite(res["psnr"])


def test_epoch_based_config_trains_without_edits():
    """A config spelling schedules in epochs — float end_step in a loss
    lambda (reference systems/base.py:36-44) + scheduler interval: epoch
    (reference systems/utils.py:328-346) — trains unmodified: epochs are
    translated to steps from the train split's image count."""
    cfg = _nerf_config().to_dict()
    cfg["system"]["loss"]["lambda_rgb"] = [0.0, 0.5, 1.0, 2.0]  # epochs 0..2
    cfg["system"]["scheduler"] = {
        "name": "ExponentialLR",
        "interval": "epoch",
        "args": {"gamma": 0.9},
    }
    cfg = config_from_dict(cfg)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    assert system.steps_per_epoch == 12  # n_train images
    # the bound C resolves epoch specs against the split length
    assert abs(float(system.C([0.0, 0.0, 1.0, 2.0], 12)) - 0.5) < 1e-6
    state = system.init_state(seed=0)
    for _ in range(3):
        state, metrics = system.train_step(state)
    assert np.isfinite(float(metrics["train/loss"]))


def _neus_config(size=64):
    cfg = _nerf_config(size).to_dict()
    cfg["model"].update(
        {
            "name": "neus",
            "cos_anneal_end": 200,
            "grid_prune_occ_thre": 0.001,
            "variance": {"init_val": 0.3, "modulate": False},
        }
    )
    cfg["model"]["geometry"] = {
        "name": "volume-sdf",
        "radius": 1.0,
        "feature_dim": 13,
        "grad_type": "analytic",
        "isosurface": {"resolution": 32, "chunk": 65536},
        "xyz_encoding_config": {
            "otype": "HashGrid",
            "n_levels": 8,
            "n_features_per_level": 2,
            "log2_hashmap_size": 16,
            "base_resolution": 16,
            "per_level_scale": 1.3195079107728942,
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
    }
    cfg["model"]["texture"]["input_feature_dim"] = 16  # 13 + 3 normals
    cfg["system"].update(
        {
            "name": "neus-system",
            "loss": {
                "lambda_rgb_mse": 10.0,
                "lambda_rgb_l1": 0.0,
                "lambda_mask": 0.1,
                "lambda_eikonal": 0.1,
                "lambda_sparsity": 0.01,
                "lambda_curvature": 0.0,
                "lambda_distortion": 0.0,
                "lambda_opaque": 0.0,
                "sparsity_scale": 1.0,
            },
        }
    )
    return config_from_dict(cfg)


def test_neus_system_trains():
    cfg = _neus_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    state = system.init_state(seed=0)

    first_metrics = None
    for _ in range(100):
        state, metrics = system.train_step(state)
        if first_metrics is None:
            first_metrics = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(last["train/loss"])
    assert last["train/loss"] < first_metrics["train/loss"]
    assert last["train/psnr"] > 10.0, last
    # eikonal keeps gradients near unit norm
    assert last["train/loss_eikonal"] < 0.5, last
