"""Data-parallel training over a 1-D device mesh with shard_map.

Replaces the reference's ``strategy: ddp_find_unused_parameters_false``
(reference launch.py:98) with the JAX-idiomatic equivalent (SURVEY.md §2c):

- mesh axis ``dp`` over all chips (ICI within a slice; identical semantics at
  1 chip / 1 host / N hosts);
- each device draws its own rays from the replicated image stack, exactly as
  each DDP rank samples independently (reference datasets/blender.py:115-123);
- per-device gradients are ``pmean``-ed inside the shard_map — XLA's
  latency-hiding scheduler overlaps the all-reduce with the backward;
- the optimizer update runs replicated (params identical on all chips);
- the occupancy-grid update shards the expensive field evaluations over
  cells and all-gathers the results — a *collective* grid (unlike the
  reference's drifting per-rank grids, models/nerf.py:55).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("dp",))


class DataParallelPlan:
    """Builds sharded train/occ-update steps for a system over a mesh.

    The single-chip path (``BaseSystem.make_train_step``) stays untouched;
    this plan is selected when a mesh with >1 device is requested.
    """

    def __init__(self, system, mesh: Mesh):
        self.system = system
        self.mesh = mesh
        self.n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        for b in getattr(system, "ray_buckets", [system.train_num_rays]):
            assert b % self.n_dev == 0, (
                f"ray bucket {b} must divide by device count {self.n_dev}"
            )
        assert system.train_capacity % self.n_dev == 0
        self.rays_per_dev = system.train_num_rays // self.n_dev
        self.capacity_per_dev = system.train_capacity // self.n_dev

    # -- train -------------------------------------------------------------
    def make_train_step(self, n_rays=None):
        return jax.jit(self._train_step_body(n_rays), donate_argnums=(0,))

    def make_train_chunk(self, n_chunk, n_rays=None):
        """``n_chunk`` sharded steps in one dispatch (lax.scan over the
        sharded step body) — the DP twin of ``BaseSystem.make_train_chunk``;
        metrics stacked along a leading (n_chunk,) axis."""
        body = self._train_step_body(n_rays)

        def chunk_fn(state, data):
            def scan_body(st, _):
                return body(st, data)

            return jax.lax.scan(scan_body, state, None, length=n_chunk)

        return jax.jit(chunk_fn, donate_argnums=(0,))

    def _train_step_body(self, n_rays=None):
        system = self.system
        mesh = self.mesh
        n_dev = self.n_dev
        rays_per_dev = (n_rays or system.train_num_rays) // n_dev
        capacity_per_dev = self.capacity_per_dev

        def body(keys, params, occ, extra, step, data):
            # keys: (1, 2) — this device's base key
            key = keys[0]
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
                    p, occ, batch, k_fwd, step,
                    n_rays=rays_per_dev, capacity=capacity_per_dev,
                    extra=extra,
                )

            (loss, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(
                params
            )
            grads = jax.lax.pmean(grads, "dp")
            loss = jax.lax.pmean(loss, "dp")
            metrics = {
                k: (
                    jax.lax.psum(v, "dp")
                    if k.endswith("num_samples")
                    else jax.lax.pmean(v, "dp")
                )
                for k, v in metrics.items()
            }
            metrics["train/loss"] = loss
            return grads, metrics

        sharded_body = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("dp"), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

        def step_fn(state, data):
            rng, k = jax.random.split(state["rng"])
            keys = jax.random.split(k, n_dev)  # (n_dev, 2) -> one per device
            grads, metrics = sharded_body(
                keys,
                state["params"],
                state["occ"],
                state.get("extra", {}),
                state["step"],
                data,
            )
            updates, opt_state = system.tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            metrics["train/lr"] = system.lr_fn(state["step"])
            extra = state.get("extra", {})
            if hasattr(system.model, "update_extra_state"):
                extra = system.model.update_extra_state(
                    params, extra, state["step"]
                )
            return {
                "params": params,
                "opt_state": opt_state,
                "occ": state["occ"],
                "extra": extra,
                "step": state["step"] + 1,
                "rng": rng,
            }, metrics

        return step_fn

    # -- collective occupancy update ----------------------------------------
    def make_occ_update(self, warmup: bool):
        """Shard cell evaluations across devices; all-gather the evaluated
        occupancies so every chip applies the identical grid update."""
        system = self.system
        mesh = self.mesh
        n_dev = self.n_dev

        def update_fn(state):
            rng, k = jax.random.split(state["rng"])
            phase = None
            if not warmup and system.grid_update_sampling == "slab":
                phase = (state["step"] // system.grid_update_every) % 8
            occ = system.model.update_occupancy(
                state["params"], state["occ"], k, step=state["step"],
                warmup=warmup, mesh=mesh, phase=phase,
            )
            return {**state, "occ": occ, "rng": rng}

        return jax.jit(update_fn, donate_argnums=(0,))
