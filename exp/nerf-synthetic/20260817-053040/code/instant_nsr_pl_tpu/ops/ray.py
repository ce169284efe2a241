"""Ray generation and ray/AABB intersection.

Replaces the reference's ``models/ray_utils.py`` (get_ray_directions/get_rays)
and nerfacc's CUDA ``ray_aabb_intersect`` (used at models/neus.py:153) with a
closed-form slab test in JAX.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_ray_directions(w, h, fx, fy, cx, cy, use_pixel_centers=True):
    """Per-pixel camera-space ray directions, OpenGL convention (-z forward,
    +y up). Reference: models/ray_utils.py:9-20. Computed in numpy on host
    once per dataset; returns an (H, W, 3) float32 array.
    """
    pixel_center = 0.5 if use_pixel_centers else 0.0
    i, j = np.meshgrid(
        np.arange(w, dtype=np.float32) + pixel_center,
        np.arange(h, dtype=np.float32) + pixel_center,
        indexing="xy",
    )
    directions = np.stack(
        [(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1
    )
    return directions.astype(np.float32)


def get_rays(directions, c2w, keepdim=False):
    """Rotate camera-space directions into world space and broadcast origins.

    Reference: models/ray_utils.py:23-43. Supports:
      directions (N, 3) with c2w (N, 3, 4) or (3, 4)
      directions (H, W, 3) with c2w (3, 4) or (N, 3, 4)
    """
    directions = jnp.asarray(directions)
    c2w = jnp.asarray(c2w)
    if directions.ndim == 2:  # (N, 3)
        if c2w.ndim == 2:  # (3, 4) broadcast
            c2w = c2w[None, ...]
        rays_d = (directions[:, None, :] * c2w[:, :3, :3]).sum(-1)  # (N, 3)
        rays_o = jnp.broadcast_to(c2w[:, :3, 3], rays_d.shape)
    elif directions.ndim == 3:  # (H, W, 3)
        if c2w.ndim == 2:
            rays_d = (directions[:, :, None, :] * c2w[None, None, :3, :3]).sum(-1)
            rays_o = jnp.broadcast_to(c2w[None, None, :3, 3], rays_d.shape)
        else:  # (N, 3, 4) -> (N, H, W, 3)
            rays_d = (
                directions[None, :, :, None, :] * c2w[:, None, None, :3, :3]
            ).sum(-1)
            rays_o = jnp.broadcast_to(
                c2w[:, None, None, :3, 3], rays_d.shape
            )
    else:
        raise ValueError(f"bad directions shape {directions.shape}")
    if not keepdim:
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
    return rays_o, rays_d


def ray_aabb_intersect(rays_o, rays_d, aabb_min, aabb_max, miss_value=1e10):
    """Slab test: per-ray entry/exit t against an axis-aligned box.

    Matches nerfacc's semantics (t_min/t_max clamped to >= 0; both set to
    ``miss_value`` = 1e10 when the ray misses the box) as consumed at
    models/neus.py:153.

    Args:
      rays_o, rays_d: (..., 3)
      aabb_min, aabb_max: scalars or (3,)
    Returns:
      (t_min, t_max): (...,) each.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-10, rays_d, 1e-10)
    t0 = (aabb_min - rays_o) * inv_d
    t1 = (aabb_max - rays_o) * inv_d
    t_near = jnp.minimum(t0, t1).max(axis=-1)
    t_far = jnp.maximum(t0, t1).min(axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    hit = t_far >= t_near
    t_min = jnp.where(hit, t_near, miss_value)
    t_max = jnp.where(hit, t_far, miss_value)
    return t_min, t_max
