"""Scene-domain contraction.

Replaces nerfacc's ``ContractionType`` + the reference's
``contract_to_unisphere`` (reference: models/geometry.py:17-29) with pure,
branch-free JAX suited to XLA: the unbounded branch uses ``jnp.where`` masking
instead of boolean indexing.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

from instant_nsr_pl_tpu.ops.activations import scale_anything


class ContractionType(enum.Enum):
    AABB = "aabb"
    UN_BOUNDED_SPHERE = "un_bounded_sphere"


def contract_to_unisphere(x, radius, contraction_type: ContractionType):
    """Map world coordinates into the unit cube [0, 1]^3.

    AABB: linear remap of [-radius, radius] -> [0, 1].
    UN_BOUNDED_SPHERE: MipNeRF-360 contraction ``(2 - 1/|x|) * x/|x|`` applied
    outside the unit ball of the scaled coordinates, result mapped into [0,1]
    (the contracted domain [-2,2] occupies [0,1]).
    """
    if contraction_type == ContractionType.AABB:
        return scale_anything(x, (-radius, radius), (0.0, 1.0))
    elif contraction_type == ContractionType.UN_BOUNDED_SPHERE:
        x = scale_anything(x, (-radius, radius), (0.0, 1.0))
        x = x * 2.0 - 1.0  # aabb is at [-1, 1]
        mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
        safe_mag = jnp.maximum(mag, 1e-12)
        contracted = (2.0 - 1.0 / safe_mag) * (x / safe_mag)
        x = jnp.where(mag > 1.0, contracted, x)
        return x / 4.0 + 0.5  # (-inf, inf) lands in [0, 1]
    else:
        raise NotImplementedError(contraction_type)


def contract_coords(px, py, pz, radius, contraction_type: ContractionType):
    """Coordinate-wise variant of :func:`contract_to_unisphere` for TPU-
    friendly layouts: takes/returns three (...,) arrays instead of one
    (..., 3) array whose unit trailing axis XLA would pad to a full
    (8, 128) tile (up to 42x memory blow-up on big sample grids)."""
    if contraction_type == ContractionType.AABB:
        s = 0.5 / radius
        return (px * s + 0.5, py * s + 0.5, pz * s + 0.5)
    elif contraction_type == ContractionType.UN_BOUNDED_SPHERE:
        xs = px / radius
        ys = py / radius
        zs = pz / radius
        mag = jnp.sqrt(xs * xs + ys * ys + zs * zs)
        safe = jnp.maximum(mag, 1e-12)
        scale = jnp.where(mag > 1.0, (2.0 - 1.0 / safe) / safe, 1.0)
        return (
            xs * scale / 4.0 + 0.5,
            ys * scale / 4.0 + 0.5,
            zs * scale / 4.0 + 0.5,
        )
    else:
        raise NotImplementedError(contraction_type)


def uncontract_from_unisphere(u, radius, contraction_type: ContractionType):
    """Inverse of :func:`contract_to_unisphere` (needed to place occupancy-grid
    cell samples back into world space — the role of nerfacc's grid
    ``contraction_type`` handling)."""
    if contraction_type == ContractionType.AABB:
        return scale_anything(u, (0.0, 1.0), (-radius, radius))
    elif contraction_type == ContractionType.UN_BOUNDED_SPHERE:
        c = u * 4.0 - 2.0  # contracted coords in [-2, 2]
        mag = jnp.linalg.norm(c, axis=-1, keepdims=True)
        safe_mag = jnp.maximum(mag, 1e-12)
        # inverse of (2 - 1/|x|) * x/|x| : |x| = 1 / (2 - |c|)
        inv = (c / safe_mag) / jnp.maximum(2.0 - safe_mag, 1e-6)
        x = jnp.where(mag > 1.0, inv, c)
        return scale_anything((x + 1.0) / 2.0, (0.0, 1.0), (-radius, radius))
    else:
        raise NotImplementedError(contraction_type)
