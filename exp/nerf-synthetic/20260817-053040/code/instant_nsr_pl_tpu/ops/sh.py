"""Spherical-harmonics direction encoding.

Replaces tiny-cuda-nn's ``SphericalHarmonics`` encoding (used via
``dir_encoding_config.otype: SphericalHarmonics, degree: 4`` — reference:
models/texture.py:17, configs/nerf-blender.yaml:59-61) with the closed-form
real SH basis evaluated as fused XLA elementwise ops. The hardware-SH
coefficients follow the standard real spherical harmonics used by tcnn:
input is a direction mapped into [0,1]^3, internally rescaled to [-1,1].
"""

from __future__ import annotations

import jax.numpy as jnp

# constants of the real spherical harmonics basis (degrees 0..3)
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def spherical_harmonics_encoding(dirs, degree: int = 4):
    """Evaluate the real SH basis of the given degree.

    Args:
      dirs: (..., 3) directions in [0, 1] (tcnn convention); rescaled to
        [-1, 1] internally. Assumed unit-norm after rescale.
      degree: 1..4 (number of bands); output has degree**2 features.
    Returns:
      (..., degree**2) float32 features.
    """
    if not 1 <= degree <= 4:
        raise ValueError("spherical_harmonics_encoding supports degree 1..4")
    d = dirs * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, _C0)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def sh_output_dim(degree: int) -> int:
    return degree * degree
