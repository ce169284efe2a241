"""Activation DSL and numerics helpers.

TPU-native re-implementation of the reference's activation utilities
(reference: models/utils.py:53-119). ``trunc_exp`` keeps the gradient-clamped
exponential used as the NeRF density activation; the string DSL mirrors
``get_activation`` (none/scaleN/clampN/mulN/lin2srgb/trunc_exp/+-float/
sigmoid/tanh/softplus/relu).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    y = jnp.exp(x)
    return y, x


def _trunc_exp_bwd(x, g):
    # clamp the saved input to <=15 in the backward pass so the gradient of
    # exp never explodes (reference: models/utils.py:53-68)
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def scale_anything(x, inp_scale, tgt_scale):
    """Affine remap of x from inp_scale=(lo,hi) to tgt_scale=(lo,hi).

    Reference: models/utils.py:100-105 (there inp_scale may default to
    (min,max) of the data; the framework only uses the explicit-range form).
    """
    lo, hi = inp_scale
    tlo, thi = tgt_scale
    x = (x - lo) / (hi - lo)
    return x * (thi - tlo) + tlo


def lin2srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x > 0.0031308, jnp.power(jnp.clip(x, 0.0031308), 1.0 / 2.4) * 1.055 - 0.055, 12.92 * x
    )


def get_activation(name):
    """String -> elementwise activation fn (reference: models/utils.py:71-97)."""
    if name is None:
        return lambda x: x
    name_lower = str(name).lower()
    if name_lower == "none":
        return lambda x: x
    if name_lower.startswith("scale"):
        scale = float(name_lower[5:])
        return lambda x: x / scale
    if name_lower.startswith("clamp"):
        clamp_max = float(name_lower[5:])
        return lambda x: jnp.clip(x, 0.0, clamp_max)
    if name_lower.startswith("mul"):
        mul = float(name_lower[3:])
        return lambda x: x * mul
    if name_lower == "lin2srgb":
        return lin2srgb
    if name_lower == "trunc_exp":
        return trunc_exp
    if name_lower.startswith("+") or name_lower.startswith("-"):
        delta = float(name_lower)
        return lambda x: x + delta
    if name_lower == "sigmoid":
        return jax.nn.sigmoid
    if name_lower == "tanh":
        return jnp.tanh
    if name_lower == "softplus":
        return jax.nn.softplus
    if name_lower == "relu":
        return jax.nn.relu
    if name_lower == "exp":
        return jnp.exp
    if name_lower == "sigmoid_mul":  # reserved for future use
        return jax.nn.sigmoid
    raise ValueError(f"Unknown activation '{name}'")
