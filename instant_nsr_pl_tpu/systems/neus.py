"""NeuS training system.

Re-implements the reference's ``NeuSSystem`` (systems/neus.py:17-265):
rgb MSE + L1 on the fg/bg composite, eikonal on SDF gradients, mask BCE,
opaque BCE, sparsity, curvature (finite-difference laplacian), fg/bg
distortion — every lambda a ``C()``-scheduled scalar evaluated inside the
jitted step. Sample-level means are masked by the packed validity mask (the
reference's ragged buffers contain only live samples; ours carry padding).
"""

from __future__ import annotations

import jax.numpy as jnp

from instant_nsr_pl_tpu.registry import systems
from instant_nsr_pl_tpu.systems.base import BaseSystem
from instant_nsr_pl_tpu.systems.criterions import (
    binary_cross_entropy,
    l1_loss,
    mse_loss,
    psnr,
)
from instant_nsr_pl_tpu.ops.rendering import distortion_loss


def _masked_mean(x, mask):
    m = mask.astype(jnp.float32)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


@systems.register("neus-system")
class NeuSSystem(BaseSystem):
    def __init__(self, config):
        super().__init__(config)
        m = config.model
        if bool(m.get("learned_background", False)):
            self.train_capacity_bg = int(
                m.get(
                    "train_num_samples_bg",
                    int(m.get("train_num_rays", 256))
                    * int(m.num_samples_per_ray_bg),
                )
            )
            self.eval_capacity_bg = int(
                m.get("eval_num_samples_bg", self.eval_chunk_rays * 128)
            )
        else:
            self.train_capacity_bg = self.train_capacity
            self.eval_capacity_bg = self.eval_capacity

    def loss_fn(self, params, occ, batch, rng, step, n_rays=None, capacity=None,
                extra=None):
        cfg = self.config.system.loss
        n_rays = n_rays if n_rays is not None else self.train_num_rays
        if capacity is not None:
            capacity_bg = self.train_capacity_bg * capacity // self.train_capacity
        else:
            capacity, capacity_bg = self.train_capacity, self.train_capacity_bg
        out = self.model.forward(
            params,
            occ,
            batch["rays_o"],
            batch["rays_d"],
            background_color=batch["background_color"],
            capacity=capacity,
            capacity_bg=capacity_bg,
            rng=rng,
            step=step,
            randomized=self.randomized,
            train=True,
            prev_inv_s=(extra or {}).get("prev_inv_s"),
        )
        ray_mask = (
            out["rays_valid_full"][:, 0] & out["rays_kept_full"]
        ).astype(jnp.float32)[:, None]
        sample_mask = out["sample_valid"]

        loss = jnp.float32(0.0)
        metrics = {}

        # rgb (reference systems/neus.py:98-104)
        loss_rgb_mse = mse_loss(
            out["comp_rgb_full"], batch["rgb"], weight=ray_mask, reduction="sum"
        ) / jnp.maximum(ray_mask.sum() * 3.0, 1.0)
        metrics["train/loss_rgb_mse"] = loss_rgb_mse
        loss = loss + loss_rgb_mse * self.C(cfg.lambda_rgb_mse, step)

        loss_rgb_l1 = l1_loss(
            out["comp_rgb_full"], batch["rgb"], weight=ray_mask, reduction="sum"
        ) / jnp.maximum(ray_mask.sum() * 3.0, 1.0)
        metrics["train/loss_rgb_l1"] = loss_rgb_l1
        loss = loss + loss_rgb_l1 * self.C(cfg.get("lambda_rgb_l1", 0.0), step)

        # eikonal (reference systems/neus.py:106-108)
        grad_norm = jnp.linalg.norm(out["sdf_grad_samples"], axis=-1)
        loss_eikonal = _masked_mean((grad_norm - 1.0) ** 2, sample_mask)
        metrics["train/loss_eikonal"] = loss_eikonal
        loss = loss + loss_eikonal * self.C(cfg.lambda_eikonal, step)

        # mask BCE (reference systems/neus.py:110-113)
        opacity = jnp.clip(out["opacity"][:, 0], 1e-3, 1.0 - 1e-3)
        if self.has_mask and not _is_zero(cfg.get("lambda_mask", 0.0)):
            fg = batch["fg_mask"]
            keep = out["rays_kept"].astype(jnp.float32)
            bce = -(
                fg * jnp.log(opacity) + (1.0 - fg) * jnp.log(1.0 - opacity)
            )
            loss_mask = (bce * keep).sum() / jnp.maximum(keep.sum(), 1.0)
            metrics["train/loss_mask"] = loss_mask
            loss = loss + loss_mask * self.C(cfg.lambda_mask, step)

        # opaque BCE(o, o) (reference systems/neus.py:115-117)
        if not _is_zero(cfg.get("lambda_opaque", 0.0)):
            loss_opaque = binary_cross_entropy(opacity, opacity)
            metrics["train/loss_opaque"] = loss_opaque
            loss = loss + loss_opaque * self.C(cfg.lambda_opaque, step)

        # sparsity (reference systems/neus.py:119-121)
        if not _is_zero(cfg.get("lambda_sparsity", 0.0)):
            scale = float(cfg.get("sparsity_scale", 1.0))
            loss_sparsity = _masked_mean(
                jnp.exp(-scale * jnp.abs(out["sdf_samples"])), sample_mask
            )
            metrics["train/loss_sparsity"] = loss_sparsity
            loss = loss + loss_sparsity * self.C(cfg.lambda_sparsity, step)

        # curvature via finite-difference laplacian (reference systems/neus.py:123-127)
        if not _is_zero(cfg.get("lambda_curvature", 0.0)):
            assert "sdf_laplace_samples" in out, (
                "curvature loss requires geometry.grad_type=finite_difference"
            )
            loss_curvature = _masked_mean(
                jnp.abs(out["sdf_laplace_samples"]), sample_mask
            )
            metrics["train/loss_curvature"] = loss_curvature
            loss = loss + loss_curvature * self.C(cfg.lambda_curvature, step)

        # distortion fg/bg (reference systems/neus.py:129-139)
        if not _is_zero(cfg.get("lambda_distortion", 0.0)):
            loss_dist = distortion_loss(
                out["weights"], out["points"], out["intervals"],
                out["ray_indices"], out["sample_valid"],
                n_rays=n_rays,
                group=self.model.packed_group(capacity),
            )
            metrics["train/loss_distortion"] = loss_dist
            loss = loss + loss_dist * self.C(cfg.lambda_distortion, step)
        if self.model.learned_background and not _is_zero(
            cfg.get("lambda_distortion_bg", 0.0)
        ):
            loss_dist_bg = distortion_loss(
                out["weights_bg"], out["points_bg"], out["intervals_bg"],
                out["ray_indices_bg"], out["sample_valid_bg"],
                n_rays=n_rays,
            )
            metrics["train/loss_distortion_bg"] = loss_dist_bg
            loss = loss + loss_dist_bg * self.C(cfg.lambda_distortion_bg, step)

        metrics["train/inv_s"] = out["inv_s"]
        metrics["train/num_samples"] = out["num_samples_full"]
        metrics["train/psnr"] = psnr(
            out["comp_rgb_full"], batch["rgb"], valid_mask=ray_mask > 0
        )
        return loss, metrics

    def forward_eval(self, params, occ, rays_o, rays_d, bg, step, capacity=None):
        capacity = capacity or self.eval_capacity
        out = self.model.forward(
            params,
            occ,
            rays_o,
            rays_d,
            background_color=bg,
            capacity=capacity,
            capacity_bg=self.eval_capacity_bg * capacity // self.eval_capacity,
            rng=None,
            step=step,
            randomized=False,
            train=False,
        )
        res = {
            "comp_rgb": out["comp_rgb_full"],
            "comp_normal": out["comp_normal"],
            "depth": out["depth"],
            "opacity": out["opacity"],
            "rays_kept": out["rays_kept_full"][:, None],
        }
        if self.model.learned_background:
            res["comp_rgb_fg"] = out["comp_rgb"]
            res["comp_rgb_bg"] = out["comp_rgb_bg"]
        return res

    def image_grid_specs(self, res):
        """Validation panels: gt | rgb_full | [fg | bg] | depth | normal
        (reference systems/neus.py:171-186)."""
        imgs = res["images"]
        specs = [
            {"type": "rgb", "img": res["gt"]},
            {"type": "rgb", "img": imgs["comp_rgb"]},
        ]
        if "comp_rgb_fg" in imgs:
            specs.append({"type": "rgb", "img": imgs["comp_rgb_fg"]})
            specs.append({"type": "rgb", "img": imgs["comp_rgb_bg"]})
        specs.append(
            {"type": "grayscale", "img": imgs["depth"], "kwargs": {"cmap": "jet"}}
        )
        specs.append({"type": "normal", "img": imgs["comp_normal"]})
        return specs


def _is_zero(v):
    return isinstance(v, (int, float)) and float(v) == 0.0
