"""Functional MLPs (the tiny-cuda-nn FullyFusedMLP / VanillaMLP role).

Replaces tcnn's fused fp16 MLPs and the reference's ``VanillaMLP``
(reference: models/network_utils.py:95-215). On TPU the MXU wants big batched
matmuls — XLA already fuses a short chain of 64-wide matmuls + elementwise
activations into a handful of kernels, so the right design is plain jnp with
bf16 inputs / fp32 accumulation via ``preferred_element_type``; profiling
(PERF.md) shows the MLPs are nowhere near the hot spots, so no hand kernel
is warranted here.

Two precision policies mirror the reference:
- "fused" MLPs (density/color heads) run matmuls in bf16 with fp32 accum
  (tcnn runs fp16 under AMP);
- VanillaMLP (the SDF network) is forced fp32 (reference:
  network_utils.py:108-112) with Softplus(beta=100) activations and sphere
  (geometric) init + optional weight norm.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    dim_in: int
    dim_out: int
    n_neurons: int = 64
    n_hidden_layers: int = 1
    activation: str = "ReLU"          # hidden activation (ReLU or Softplus100)
    output_activation: str = "none"   # applied by callers via get_activation
    sphere_init: bool = False
    sphere_init_radius: float = 0.5
    weight_norm: bool = False
    precision: str = "bf16"           # "bf16" (fused-style) or "fp32" (vanilla)

    @property
    def n_layers(self) -> int:
        # input layer + (n_hidden_layers - 1) hidden + output layer
        return self.n_hidden_layers + 1

    @classmethod
    def from_config(cls, dim_in, dim_out, config, precision=None) -> "MLPSpec":
        otype = config.get("otype", "VanillaMLP")
        vanilla = otype == "VanillaMLP"
        return cls(
            dim_in=dim_in,
            dim_out=dim_out,
            n_neurons=int(config["n_neurons"]),
            n_hidden_layers=int(config["n_hidden_layers"]),
            activation=str(config.get("activation", "ReLU")),
            output_activation=str(config.get("output_activation", "none")),
            sphere_init=bool(config.get("sphere_init", False)),
            sphere_init_radius=float(config.get("sphere_init_radius", 0.5)),
            weight_norm=bool(config.get("weight_norm", False)),
            precision=precision or ("fp32" if vanilla else "bf16"),
        )


def _layer_dims(spec: MLPSpec):
    dims = [spec.dim_in] + [spec.n_neurons] * spec.n_hidden_layers + [spec.dim_out]
    return list(zip(dims[:-1], dims[1:]))


def mlp_init(rng, spec: MLPSpec, dtype=jnp.float32):
    """Init params as a list of layer dicts.

    Sphere (geometric) init follows the reference (network_utils.py:118-133):
    last layer weights ~ N(sqrt(pi)/sqrt(d_in), 1e-4), bias = -r; first layer
    zeros beyond the xyz columns, N(0, sqrt(2)/sqrt(d_out)) on xyz; hidden
    layers N(0, sqrt(2)/sqrt(d_out)). Default init is Kaiming-uniform.
    """
    params = []
    dims = _layer_dims(spec)
    n_layers = len(dims)
    keys = jax.random.split(rng, n_layers)
    for li, ((d_in, d_out), key) in enumerate(zip(dims, keys)):
        is_first, is_last = li == 0, li == n_layers - 1
        if spec.sphere_init:
            if is_last:
                w = jax.random.normal(key, (d_in, d_out), dtype) * 1e-4 + (
                    math.sqrt(math.pi) / math.sqrt(d_in)
                )
                b = jnp.full((d_out,), -spec.sphere_init_radius, dtype)
            elif is_first:
                w = jnp.zeros((d_in, d_out), dtype)
                w = w.at[:3].set(
                    jax.random.normal(key, (3, d_out), dtype)
                    * (math.sqrt(2.0) / math.sqrt(d_out))
                )
                b = jnp.zeros((d_out,), dtype)
            else:
                w = jax.random.normal(key, (d_in, d_out), dtype) * (
                    math.sqrt(2.0) / math.sqrt(d_out)
                )
                b = jnp.zeros((d_out,), dtype)
        else:
            # kaiming uniform, fan_in mode, gain sqrt(2) (ReLU)
            bound = math.sqrt(6.0 / d_in)
            w = jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)
            b = jnp.zeros((d_out,), dtype)
        layer = {"w": w, "b": b}
        if spec.weight_norm:
            # reparameterize w = g * v / ||v||, per output unit (dim 0 norm)
            g = jnp.linalg.norm(w, axis=0)
            layer = {"v": w, "g": g, "b": b}
        params.append(layer)
    return params


def _hidden_act(spec: MLPSpec, x):
    if spec.sphere_init or spec.activation.lower().startswith("softplus"):
        # Softplus(beta=100): numerically = relu for |x| > ~0.1
        beta = 100.0
        return jax.nn.softplus(beta * x) / beta
    return jax.nn.relu(x)


def mlp_apply(params, x, spec: MLPSpec):
    """Apply the MLP. Output activation is NOT applied here (callers use the
    activation DSL, matching the reference's split responsibility)."""
    if spec.precision == "bf16":
        compute_dtype = jnp.bfloat16
    else:
        compute_dtype = jnp.float32
    h = x.astype(compute_dtype)
    n = len(params)
    for li, layer in enumerate(params):
        if spec.weight_norm:
            v, g, b = layer["v"], layer["g"], layer["b"]
            w = v * (g / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12))
        else:
            w, b = layer["w"], layer["b"]
        h = (
            jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
            + b
        )
        if li < n - 1:
            h = _hidden_act(spec, h).astype(compute_dtype)
    return h.astype(jnp.float32)
