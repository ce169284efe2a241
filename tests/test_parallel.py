"""Data-parallel training tests on the virtual 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import datasets, systems
import instant_nsr_pl_tpu.datasets  # noqa: F401
import instant_nsr_pl_tpu.systems  # noqa: F401
from instant_nsr_pl_tpu.parallel import make_mesh


def _cfg():
    return config_from_dict(
        {
            "dataset": {"name": "synthetic", "size": 64, "n_train": 8, "n_val": 1},
            "model": {
                "name": "nerf",
                "dynamic_ray_sampling": False,
                "radius": 1.0,
                "num_samples_per_ray": 64,
                "train_num_rays": 64,
                "max_train_num_rays": 512,
                "train_num_samples": 8192,
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
                    "xyz_encoding_config": {
                        "otype": "HashGrid",
                        "n_levels": 6,
                        "n_features_per_level": 2,
                        "log2_hashmap_size": 15,
                        "base_resolution": 16,
                        "per_level_scale": 1.447269237440378,
                    },
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
                    "dir_encoding_config": {"otype": "SphericalHarmonics", "degree": 2},
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_training_runs_and_learns():
    cfg = _cfg()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    mesh = make_mesh(8)
    system.configure_parallel(mesh)
    state = system.init_state(seed=0)

    first = None
    for _ in range(60):
        state, metrics = system.train_step(state)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(last["train/loss"])
    assert last["train/loss"] < first["train/loss"]
    assert last["train/psnr"] > first["train/psnr"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_grid_update_collective_matches_single():
    """The sharded occupancy update must produce the same grid as the
    single-device update (same rng)."""
    cfg = _cfg()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    state = system.init_state(seed=0)

    rng = jax.random.PRNGKey(7)
    occ_single = system.model.update_occupancy(
        state["params"], state["occ"], rng, step=0, warmup=True
    )
    mesh = make_mesh(8)
    occ_sharded = system.model.update_occupancy(
        state["params"], state["occ"], rng, step=0, warmup=True, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(occ_single["grid"].occs),
        np.asarray(occ_sharded["grid"].occs),
        rtol=1e-5,
        atol=1e-6,
    )
    assert (
        np.asarray(occ_single["grid"].binary)
        == np.asarray(occ_sharded["grid"].binary)
    ).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_gradient_parity_matches_single_device():
    """THE DDP-correctness invariant: one pmean'd 8-device step equals a
    single-device step over the union of the per-device batches at matched
    RNG (params compared after the optax update)."""
    import optax

    cfg = _cfg()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    mesh = make_mesh(8)
    plan = system.configure_parallel(mesh)
    state = system.init_state(seed=0)
    data = system.data
    n_dev = plan.n_dev
    rays_per_dev = plan.rays_per_dev
    cap_per_dev = plan.capacity_per_dev

    # --- hand-rolled single-device emulation of the DP step (reads only,
    # computed BEFORE the donating dp step consumes the state buffers)
    rng, k = jax.random.split(state["rng"])
    keys = jax.random.split(k, n_dev)
    grads_acc = None
    losses = []
    for key in np.asarray(keys):
        key = jnp.asarray(key)
        k_sample, k_bg, k_fwd = jax.random.split(key, 3)
        rays_o, rays_d, rgb, fg_mask = system._sample_rays(
            data, k_sample, n=rays_per_dev
        )
        bg = system._background_color(k_bg, rays_per_dev, train=True)
        if system.apply_mask:
            rgb = rgb * fg_mask[:, None] + jnp.broadcast_to(bg, rgb.shape) * (
                1.0 - fg_mask[:, None]
            )
        batch = {
            "rays_o": rays_o,
            "rays_d": rays_d,
            "rgb": rgb,
            "fg_mask": fg_mask,
            "background_color": bg,
        }

        def loss_of(p):
            return system.loss_fn(
                p, state["occ"], batch, k_fwd, state["step"],
                n_rays=rays_per_dev, capacity=cap_per_dev,
                extra=state.get("extra", {}),
            )

        (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"]
        )
        losses.append(float(loss))
        grads_acc = (
            grads
            if grads_acc is None
            else jax.tree.map(jnp.add, grads_acc, grads)
        )
    grads_mean = jax.tree.map(lambda g: g / n_dev, grads_acc)
    updates, _ = system.tx.update(
        grads_mean, state["opt_state"], state["params"]
    )
    params_expect = jax.tree.map(
        np.asarray, optax.apply_updates(state["params"], updates)
    )
    loss_expect = float(np.mean(losses))

    # --- the actual DP step (donates state)
    dp_step = plan.make_train_step()
    new_state, metrics = dp_step(state, data)

    assert abs(float(metrics["train/loss"]) - loss_expect) < 1e-5 * max(
        1.0, abs(loss_expect)
    )
    flat_e, _ = jax.tree_util.tree_flatten_with_path(params_expect)
    flat_g = jax.tree_util.tree_leaves(
        jax.tree.map(np.asarray, new_state["params"])
    )
    for (path, e), g in zip(flat_e, flat_g):
        np.testing.assert_allclose(
            e, g, rtol=2e-5, atol=1e-7, err_msg=jax.tree_util.keystr(path)
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_ray_count_divisibility_guard():
    cfg = _cfg()
    cfg.model["max_train_num_rays"] = 100  # not divisible by 8
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    with pytest.raises(AssertionError):
        system.configure_parallel(make_mesh(8))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_train_chunk_matches_per_step_loop():
    """The sharded scan megastep (plan.make_train_chunk via
    BaseSystem.train_chunk) must track the per-step DP loop: same cadence,
    same loss trajectory (fp-level — see tests/test_train_chunk.py for why
    bitwise parameter equality is not the invariant under Adam)."""
    n_steps = 12

    def fresh():
        cfg = _cfg()
        cfg.model.grid_warmup_steps = 8
        cfg.model.grid_update_every = 4
        dm = datasets.make(cfg.dataset.name, cfg.dataset)
        dm.setup("fit")
        system = systems.make(cfg.system.name, cfg)
        system.setup_data(dm.train)
        system.configure_parallel(make_mesh(8))
        return system

    sys_a = fresh()
    state_a = sys_a.init_state(seed=0)
    losses_a = []
    for _ in range(n_steps):
        state_a, metrics_a = sys_a.train_step(state_a)
        losses_a.append(float(metrics_a["train/loss"]))

    sys_b = fresh()
    state_b = sys_b.init_state(seed=0)
    state_b, _ = sys_b.train_chunk(state_b, 3)
    state_b, metrics_b = sys_b.train_chunk(state_b, n_steps - 3)

    assert int(state_a["step"]) == int(state_b["step"]) == n_steps
    np.testing.assert_allclose(
        losses_a[-1], float(metrics_b["train/loss"]), rtol=2e-2, atol=1e-5
    )
    assert np.isfinite(float(metrics_b["train/loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_training_with_hash_tap_dedup():
    """Tap dedup under the sharded DP plan: the per-device packed capacity
    must stay block-divisible and the sharded step must train (the dedup
    spec is chosen at trace time inside shard_map)."""
    cfg = _cfg()
    cfg.model["num_samples_per_ray"] = 1024  # strided march picks k=8
    cfg.model["train_num_samples"] = 16384  # 2048/device, % 8 == 0
    cfg.model["geometry"]["xyz_encoding_config"]["grad_mode"] = "fast"
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    enc = system.model.geometry.encoding_with_network.encoding
    assert enc.dedup_spec is not None  # wiring reached the encoding
    mesh = make_mesh(8)
    system.configure_parallel(mesh)
    state = system.init_state(seed=0)
    first = None
    for _ in range(30):
        state, metrics = system.train_step(state)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(last["train/loss"])
    assert last["train/loss"] < first["train/loss"]
