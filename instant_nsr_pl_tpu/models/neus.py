"""NeuS SDF renderer with learned NeRF background.

Re-designs the reference NeuSModel (models/neus.py:15-321) for TPU:

- ``VarianceNetwork`` becomes a single learnable scalar in the param pytree;
  ``inv_s = exp(10 * variance)`` with the optional step-scheduled modulation
  clamp carried as a pure function of (step, captured pre-modulation inv_s)
  (reference models/neus.py:15-43);
- the SDF->alpha section-integral formula with cosine annealing is verbatim
  math (reference models/neus.py:117-139) on packed samples;
- the foreground marches inside the AABB with grid-only pruning (reference
  models/neus.py:209-220); the background is a second NeRF field marched from
  the far AABB intersection with cone-angle stepping (reference
  models/neus.py:141-203).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from instant_nsr_pl_tpu.registry import models
from instant_nsr_pl_tpu.ops.contraction import ContractionType
from instant_nsr_pl_tpu.ops.marching import (
    OccGridSpec,
    march_rays,
    occupancy_grid_init,
    occupancy_grid_update,
    packed_positions,
)
from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect
from instant_nsr_pl_tpu.ops.rendering import (
    accumulate_along_rays,
    render_weight_from_alpha,
    render_weight_from_density,
)


class VarianceNetwork:
    """Single learnable variance parameter: inv_s = exp(10 * variance)
    (reference models/neus.py:15-43)."""

    def __init__(self, config):
        self.config = config
        self.init_val = float(config.init_val)
        self.modulate = bool(config.get("modulate", False))
        if self.modulate:
            self.mod_start_steps = int(config.mod_start_steps)
            self.reach_max_steps = int(config.reach_max_steps)
            self.max_inv_s = float(config.max_inv_s)

    def init(self, rng):
        return {"variance": jnp.float32(self.init_val)}

    def inv_s(self, params, step=None, prev_inv_s=None):
        val = jnp.exp(params["variance"] * 10.0)
        if self.modulate and step is not None and prev_inv_s is not None:
            ratio = jnp.asarray(step, jnp.float32) / self.reach_max_steps
            mod_val = jnp.minimum(
                ratio * (self.max_inv_s - prev_inv_s) + prev_inv_s, self.max_inv_s
            )
            val = jnp.where(step > self.mod_start_steps, jnp.minimum(val, mod_val), val)
        return val


@models.register("neus")
class NeuSModel:
    def __init__(self, config):
        self.config = config
        self.radius = float(config.radius)
        self.geometry = models.make(config.geometry.name, config.geometry)
        self.texture = models.make(config.texture.name, config.texture)
        self.geometry.contraction_type = ContractionType.AABB
        self.variance = VarianceNetwork(config.variance)

        self.num_samples_per_ray = int(config.num_samples_per_ray)
        self.render_step_size = 1.732 * 2.0 * self.radius / self.num_samples_per_ray
        self.grid_prune = bool(config.get("grid_prune", True))
        cell = 2.0 * self.radius / 128
        auto = int(2.0 * cell / self.render_step_size)
        self.occ_stride = int(
            config.get("grid_lookup_stride", min(8, max(1, auto)))
        )
        while self.num_samples_per_ray % self.occ_stride:
            self.occ_stride -= 1
        # group-granular compaction (ops/marching.py): sorts R*S/k group
        # keys instead of R*S sample keys - the march's dominant cost
        self.group_compact = bool(config.get("march_group_compact", True))
        # hash-grid per-group tap dedup (see models/nerf.py): the fg domain
        # is always AABB + uniform stepping, so only the march-group
        # guarantee gates it here; applies to the jac (second-order) path
        import os

        if (
            bool(config.get("hash_tap_dedup", True))
            and not os.environ.get("INSR_DISABLE_HASH_DEDUP")
            and self.group_compact
            and self.grid_prune
            and self.occ_stride > 1
        ):
            fn = getattr(self.geometry, "configure_dedup", None)
            if fn is not None:
                fn(self.occ_stride,
                   self.render_step_size / (2.0 * self.radius))
        self.occ_thre = float(config.get("grid_prune_occ_thre", 0.01))
        self.occ_spec = OccGridSpec(
            resolution=128, radius=self.radius, contraction_type=ContractionType.AABB
        )
        self.cos_anneal_end = int(config.get("cos_anneal_end", 0))

        self.learned_background = bool(config.learned_background)
        if self.learned_background:
            self.geometry_bg = models.make(config.geometry_bg.name, config.geometry_bg)
            self.texture_bg = models.make(config.texture_bg.name, config.texture_bg)
            self.geometry_bg.contraction_type = ContractionType.UN_BOUNDED_SPHERE
            self.near_plane_bg, self.far_plane_bg = 0.1, 1e3
            self.num_samples_per_ray_bg = int(config.num_samples_per_ray_bg)
            self.cone_angle_bg = (
                10.0 ** (math.log10(self.far_plane_bg) / self.num_samples_per_ray_bg)
                - 1.0
            )
            self.render_step_size_bg = 0.01
            self.occ_thre_bg = float(config.get("grid_prune_occ_thre_bg", 0.01))
            self.occ_spec_bg = OccGridSpec(
                resolution=256,
                radius=self.radius,
                contraction_type=ContractionType.UN_BOUNDED_SPHERE,
            )

    def packed_group(self, capacity: int) -> int:
        """Static block size of the fg packed buffer: k when the
        group-compacted march guarantees single-ray aligned k-blocks
        (enables two-level segmented compositing, ops/rendering.py), else 1.
        The bg march (exponential stepping) never group-compacts."""
        if (
            self.group_compact
            and self.grid_prune
            and self.occ_stride > 1
            and capacity % self.occ_stride == 0
        ):
            return self.occ_stride
        return 1

    # -- state -------------------------------------------------------------
    def init(self, rng):
        keys = jax.random.split(rng, 5)
        params = {
            "geometry": self.geometry.init(keys[0]),
            "texture": self.texture.init(keys[1]),
            "variance": self.variance.init(keys[2]),
        }
        if self.learned_background:
            params["geometry_bg"] = self.geometry_bg.init(keys[3])
            params["texture_bg"] = self.texture_bg.init(keys[4])
        return params

    def init_occupancy(self):
        occ = {"grid": occupancy_grid_init(self.occ_spec)}
        if self.learned_background:
            occ["grid_bg"] = occupancy_grid_init(self.occ_spec_bg)
        return occ

    def init_extra_state(self):
        """Non-gradient training state beyond the occupancy grids: the
        pre-modulation inv_s snapshot used by the variance-modulation clamp
        (reference models/neus.py:30-43, Python-side mutation there)."""
        if self.variance.modulate:
            return {"prev_inv_s": jnp.exp(jnp.float32(self.variance.init_val) * 10.0)}
        return {}

    def update_extra_state(self, params, extra, step):
        """Pure per-step update: snapshot inv_s until modulation starts."""
        if not self.variance.modulate:
            return extra
        raw = jnp.exp(params["variance"]["variance"] * 10.0)
        prev = jnp.where(
            step <= self.variance.mod_start_steps, raw, extra["prev_inv_s"]
        )
        return {**extra, "prev_inv_s": prev}

    def cos_anneal_ratio(self, step):
        """Grows 0 -> 1 over cos_anneal_end steps (reference models/neus.py:92)."""
        if self.cos_anneal_end == 0 or step is None:
            return jnp.float32(1.0)
        return jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / self.cos_anneal_end)

    # -- occupancy maintenance (reference models/neus.py:94-111) -----------
    def update_occupancy(
        self, params, occ, rng, step=None, warmup=False, mesh=None, phase=None
    ):
        if not self.grid_prune:
            return occ
        inv_s = jnp.clip(self.variance.inv_s(params["variance"]), 1e-6, 1e6)

        def occ_eval_fn(x):
            sdf = self.geometry.apply(
                params["geometry"], x, step=step, with_grad=False, with_feature=False
            )
            est_next = sdf - self.render_step_size * 0.5
            est_prev = sdf + self.render_step_size * 0.5
            prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
            next_cdf = jax.nn.sigmoid(est_next * inv_s)
            return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)

        k_fg, k_bg = jax.random.split(rng)
        new = {
            "grid": occupancy_grid_update(
                occ["grid"], self.occ_spec, k_fg, occ_eval_fn,
                occ_thre=self.occ_thre, warmup=warmup, mesh=mesh, phase=phase,
            )
        }
        if self.learned_background:

            def occ_eval_fn_bg(x):
                density, _ = self.geometry_bg.apply(params["geometry_bg"], x, step=step)
                return density * self.render_step_size_bg

            new["grid_bg"] = occupancy_grid_update(
                occ["grid_bg"], self.occ_spec_bg, k_bg, occ_eval_fn_bg,
                occ_thre=self.occ_thre_bg, warmup=warmup, mesh=mesh, phase=phase,
            )
        return new

    # -- NeuS alpha (reference models/neus.py:117-139) ----------------------
    def get_alpha(self, inv_s, cos_anneal_ratio, sdf, normal, dirs, dists):
        true_cos = (dirs * normal).sum(-1)
        # anneal keeps the cos "not dead" early in training
        iter_cos = -(
            jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
            + jax.nn.relu(-true_cos) * cos_anneal_ratio
        )  # always non-positive
        est_next_sdf = sdf + iter_cos * dists * 0.5
        est_prev_sdf = sdf - iter_cos * dists * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev_sdf * inv_s)
        next_cdf = jax.nn.sigmoid(est_next_sdf * inv_s)
        alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
        return alpha

    # -- background (reference models/neus.py:141-203) ----------------------
    def forward_bg(
        self, params, occ, rays_o, rays_d, *, background_color, capacity,
        rng=None, step=None, randomized=False, train=False,
    ):
        n_rays = rays_o.shape[0]
        _, t_max = ray_aabb_intersect(rays_o, rays_d, -self.radius, self.radius)
        # start from the far AABB intersection; from near_plane_bg on miss
        near = jnp.where(t_max > 1e9, self.near_plane_bg, t_max)
        far = jnp.full((n_rays,), self.far_plane_bg, jnp.float32)

        samples = march_rays(
            rays_o, rays_d, near, far,
            render_step_size=self.render_step_size_bg,
            max_samples=self.num_samples_per_ray_bg,
            capacity=capacity,
            cone_angle=self.cone_angle_bg,
            stratified=randomized,
            rng=rng,
            occ_binary=occ["grid_bg"].binary if self.grid_prune else None,
            occ_spec=self.occ_spec_bg,
        )
        samples = jax.tree_util.tree_map(jax.lax.stop_gradient, samples)
        positions, dirs, t_mid, intervals = packed_positions(samples, rays_o, rays_d)

        density, feature = self.geometry_bg.apply(
            params["geometry_bg"], positions, step=step
        )
        rgb = self.texture_bg.apply(params["texture_bg"], feature, dirs, step=step)
        weights = render_weight_from_density(
            samples.t_starts, samples.t_ends, density,
            samples.ray_indices, samples.valid,
        )
        # one stacked scatter-free contraction for (opacity, depth, rgb) —
        # see models/nerf.py forward
        vals = jnp.concatenate(
            [jnp.ones((t_mid.shape[0], 1), t_mid.dtype), t_mid[:, None], rgb],
            axis=-1,
        )
        acc = accumulate_along_rays(
            weights, samples.ray_indices, vals, n_rays=n_rays,
            valid=samples.valid, ends=samples.ray_ends,
        )
        opacity, depth, comp_rgb = acc[:, 0:1], acc[:, 1:2], acc[:, 2:5]
        bg = jnp.broadcast_to(jnp.asarray(background_color), comp_rgb.shape)
        comp_rgb = comp_rgb + bg * (1.0 - opacity)

        out = {
            "comp_rgb": comp_rgb,
            "opacity": opacity,
            "depth": depth,
            "rays_valid": opacity > 0,
            "rays_kept": samples.ray_kept,
            "num_samples": samples.num_valid,
        }
        if train:
            out.update(
                {
                    "weights": weights,
                    "points": t_mid,
                    "intervals": intervals,
                    "ray_indices": samples.ray_indices,
                    "sample_valid": samples.valid,
                }
            )
        return out

    # -- foreground + composite (reference models/neus.py:205-287) ----------
    def forward(
        self, params, occ, rays_o, rays_d, *, background_color, capacity,
        capacity_bg=None, rng=None, step=None, randomized=False, train=False,
        prev_inv_s=None,
    ):
        n_rays = rays_o.shape[0]
        if rng is not None:
            rng, rng_bg = jax.random.split(rng)
        else:
            rng_bg = None
        t_min, t_max = ray_aabb_intersect(rays_o, rays_d, -self.radius, self.radius)
        samples = march_rays(
            rays_o, rays_d, t_min, t_max,
            render_step_size=self.render_step_size,
            max_samples=self.num_samples_per_ray,
            capacity=capacity,
            cone_angle=0.0,
            stratified=randomized,
            rng=rng,
            occ_binary=occ["grid"].binary if self.grid_prune else None,
            occ_spec=self.occ_spec,
            occ_dilated=occ["grid"].binary_dilated if self.grid_prune else None,
            occ_stride=self.occ_stride,
            group_compact=self.packed_group(capacity) > 1,
            occ_bricks=occ["grid"].bricks if self.grid_prune else None,
        )
        grp = self.packed_group(capacity)
        samples = jax.tree_util.tree_map(jax.lax.stop_gradient, samples)
        positions, dirs, t_mid, dists = packed_positions(
            samples, rays_o, rays_d, group=grp
        )

        if self.geometry.grad_type == "finite_difference":
            sdf, sdf_grad, feature, sdf_laplace = self.geometry.apply(
                params["geometry"], positions, step=step,
                with_grad=True, with_feature=True, with_laplace=True,
            )
        else:
            sdf, sdf_grad, feature = self.geometry.apply(
                params["geometry"], positions, step=step,
                with_grad=True, with_feature=True, grouped=grp > 1,
            )
            sdf_laplace = None
        # an EXACTLY zero gradient (padding samples with collapsed clipped
        # stencils, or locally-constant SDF under progressive masking) makes
        # sqrt(0) in the norm backward poison the step with NaNs even where
        # masked (0 * NaN = NaN) — substitute a safe unit vector
        grad_norm2 = (sdf_grad * sdf_grad).sum(-1, keepdims=True)
        sdf_grad = jnp.where(
            (grad_norm2 > 1e-20) & samples.valid[:, None],
            sdf_grad,
            jnp.float32(1.0 / math.sqrt(3.0)),
        )
        normal = sdf_grad / jnp.maximum(
            jnp.linalg.norm(sdf_grad, axis=-1, keepdims=True), 1e-10
        )
        inv_s = jnp.clip(
            self.variance.inv_s(params["variance"], step=step, prev_inv_s=prev_inv_s),
            1e-6, 1e6,
        )
        alpha = self.get_alpha(
            inv_s, self.cos_anneal_ratio(step), sdf, normal, dirs, dists
        )
        rgb = self.texture.apply(params["texture"], feature, dirs, normal, step=step)

        weights = render_weight_from_alpha(
            alpha, samples.ray_indices, samples.valid, group=grp
        )
        # one stacked scatter-free contraction for (opacity, depth, rgb,
        # normal) — see models/nerf.py forward
        vals = jnp.concatenate(
            [
                jnp.ones((t_mid.shape[0], 1), t_mid.dtype),
                t_mid[:, None],
                rgb,
                normal,
            ],
            axis=-1,
        )
        acc = accumulate_along_rays(
            weights, samples.ray_indices, vals, n_rays=n_rays,
            valid=samples.valid, group=grp, ends=samples.ray_ends,
        )
        opacity, depth = acc[:, 0:1], acc[:, 1:2]
        comp_rgb, comp_normal = acc[:, 2:5], acc[:, 5:8]
        comp_normal = comp_normal / jnp.maximum(
            jnp.linalg.norm(comp_normal, axis=-1, keepdims=True), 1e-10
        )

        out = {
            "comp_rgb": comp_rgb,
            "comp_normal": comp_normal,
            "opacity": opacity,
            "depth": depth,
            "rays_valid": opacity > 0,
            "rays_kept": samples.ray_kept,
            "num_samples": samples.num_valid,
            "inv_s": inv_s,
        }
        if train:
            out.update(
                {
                    "sdf_samples": sdf,
                    "sdf_grad_samples": sdf_grad,
                    "weights": weights,
                    "points": t_mid,
                    "intervals": dists,
                    "ray_indices": samples.ray_indices,
                    "sample_valid": samples.valid,
                }
            )
            if sdf_laplace is not None:
                out["sdf_laplace_samples"] = sdf_laplace

        if self.learned_background:
            out_bg = self.forward_bg(
                params, occ, rays_o, rays_d,
                background_color=background_color,
                capacity=capacity_bg or capacity,
                rng=rng_bg, step=step, randomized=randomized, train=train,
            )
        else:
            bg = jnp.broadcast_to(jnp.asarray(background_color), comp_rgb.shape)
            out_bg = {
                "comp_rgb": bg,
                "num_samples": jnp.zeros_like(out["num_samples"]),
                "rays_valid": jnp.zeros_like(out["rays_valid"]),
                "rays_kept": jnp.ones_like(out["rays_kept"]),
            }

        out_full = {
            "comp_rgb": out["comp_rgb"] + out_bg["comp_rgb"] * (1.0 - out["opacity"]),
            "num_samples": out["num_samples"] + out_bg["num_samples"],
            "rays_valid": out["rays_valid"] | out_bg["rays_valid"],
            "rays_kept": out["rays_kept"] & out_bg["rays_kept"],
        }
        return {
            **out,
            **{k + "_bg": v for k, v in out_bg.items()},
            **{k + "_full": v for k, v in out_full.items()},
        }

    def forward_level(self, params, points, step=None):
        return self.geometry.forward_level(params["geometry"], points, step=step)

    def isosurface(self, params, step=None):
        return self.geometry.isosurface(params["geometry"], step=step)

    def regularizations(self, out):
        return {}

    def export(self, params, export_config, step=None):
        """Mesh + optional "albedo" vertex colors: view dirs set to -normal
        (reference models/neus.py:316-321)."""
        mesh = self.isosurface(params, step=step)
        if export_config.get("export_vertex_color", False):
            from instant_nsr_pl_tpu.models.isosurface import chunked_point_eval

            def vertex_rgb(v_pos):
                _, sdf_grad, feature = self.geometry.apply(
                    params["geometry"], v_pos, step=step,
                    with_grad=True, with_feature=True,
                )
                normal = sdf_grad / jnp.maximum(
                    jnp.linalg.norm(sdf_grad, axis=-1, keepdims=True), 1e-10
                )
                rgb = self.texture.apply(
                    params["texture"], feature, -normal, normal, step=step
                )
                return jnp.clip(rgb, 0.0, 1.0)

            # chunked by export.chunk_size (reference models/neus.py:317).
            # Non-fatal: on a device failure (observed RESOURCE_EXHAUSTED at
            # DTU mesh sizes even after chunk halving) keep the geometry-only
            # mesh — chamfer/downstream use only needs v_pos/t_pos_idx.
            try:
                # the analytic-normal eval carries the jac path (~0.7 KB
                # of transients per point): cap the chunk below the config
                # default — after a first OOM the device client is wedged
                # (observed: even 4 KB transfers fail), so avoid triggering
                # it at all rather than relying on the halving retry
                mesh["v_rgb"] = chunked_point_eval(
                    jax.jit(vertex_rgb),
                    mesh["v_pos"],
                    min(int(export_config.get("chunk_size", 2097152)), 262144),
                )
            except Exception as e:
                import traceback

                traceback.print_exc()  # device failures AND real bugs: keep
                # the stack so a programming error can't hide behind the
                # graceful geometry-only degradation
                print(
                    f"[export] vertex-color eval failed "
                    f"({type(e).__name__}) — saving geometry-only mesh",
                    flush=True,
                )
        return mesh
