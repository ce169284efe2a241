"""NeRF training system.

Re-implements the reference's ``NeRFSystem`` (systems/nerf.py:16-218) on the
functional base: smooth-L1 rgb loss on valid (and capacity-kept) rays,
optional MipNeRF-360 distortion loss, PSNR validation. The reference's
dynamic ray batching (systems/nerf.py:93-95) is replaced by the static
ray-count + packed-capacity design (see ops/marching.py): compute per step is
constant, pruning shows up as a higher live-sample fraction instead of a
larger ray batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from instant_nsr_pl_tpu.registry import systems
from instant_nsr_pl_tpu.systems.base import BaseSystem
from instant_nsr_pl_tpu.systems.criterions import psnr, smooth_l1_loss
from instant_nsr_pl_tpu.ops.rendering import distortion_loss


@systems.register("nerf-system")
class NeRFSystem(BaseSystem):
    def loss_fn(self, params, occ, batch, rng, step, n_rays=None, capacity=None,
                extra=None):
        loss_cfg = self.config.system.loss
        n_rays = n_rays if n_rays is not None else self.train_num_rays
        capacity = capacity if capacity is not None else self.train_capacity
        out = self.model.forward(
            params,
            occ,
            batch["rays_o"],
            batch["rays_d"],
            background_color=batch["background_color"],
            capacity=capacity,
            rng=rng,
            step=step,
            randomized=self.randomized,
            train=True,
        )
        # loss only on rays that hit something AND were fully packed
        mask = (out["rays_valid"][:, 0] & out["rays_kept"]).astype(jnp.float32)
        denom = jnp.maximum(mask.sum(), 1.0)

        loss = jnp.float32(0.0)
        metrics = {}

        per_ray = smooth_l1_loss(
            out["comp_rgb"], batch["rgb"], reduction="none"
        ).mean(-1)
        loss_rgb = (per_ray * mask).sum() / denom
        metrics["train/loss_rgb"] = loss_rgb
        loss = loss + loss_rgb * self.C(loss_cfg.lambda_rgb, step)

        lambda_dist = loss_cfg.get("lambda_distortion", 0.0)
        if not _is_zero(lambda_dist):
            loss_dist = distortion_loss(
                out["weights"],
                out["points"],
                out["intervals"],
                out["ray_indices"],
                out["sample_valid"],
                n_rays=n_rays,
                group=self.model.packed_group(capacity),
            )
            metrics["train/loss_distortion"] = loss_dist
            loss = loss + loss_dist * self.C(lambda_dist, step)

        metrics["train/num_samples"] = out["num_samples"]
        metrics["train/psnr"] = psnr(
            out["comp_rgb"], batch["rgb"], valid_mask=mask[:, None] > 0
        )
        return loss, metrics

    def forward_eval(self, params, occ, rays_o, rays_d, bg, step, capacity=None):
        out = self.model.forward(
            params,
            occ,
            rays_o,
            rays_d,
            background_color=bg,
            capacity=capacity or self.eval_capacity,
            rng=None,
            step=step,
            randomized=False,
            train=False,
        )
        return {
            "comp_rgb": out["comp_rgb"],
            "depth": out["depth"],
            "opacity": out["opacity"],
            "rays_kept": out["rays_kept"][:, None],
        }

    def image_grid_specs(self, res):
        """Validation panel layout: gt | rgb | depth | opacity (reference
        systems/nerf.py:140-145)."""
        imgs = res["images"]
        return [
            {"type": "rgb", "img": res["gt"]},
            {"type": "rgb", "img": imgs["comp_rgb"]},
            {"type": "grayscale", "img": imgs["depth"], "kwargs": {"cmap": "jet"}},
            {
                "type": "grayscale",
                "img": imgs["opacity"],
                "kwargs": {"cmap": None, "data_range": (0, 1)},
            },
        ]


def _is_zero(v):
    return isinstance(v, (int, float)) and float(v) == 0.0
