"""CP (CANDECOMP/PARAFAC) factorized line encoding — ZERO random gathers.

The TPU cost model (PERF.md, scripts/microbench_pallas_gather.py) says
random-access table reads are the floor: XLA's gather costs ~5.4 ns/row
no matter what, Pallas row reads are worse (~40 ns), and v5e has no
SparseCore. The hash grid needs 128 gathers/sample, the VM encoding 18.
This encoding needs **none**: features are products of per-axis LINE
interpolations,

    feat_s(x) = ( Lx_s(x0) * Ly_s(x1) * Lz_s(x2) ) @ B_s        (N, C)->(N, F)

and a 1-D linear interpolation against an (R, C) line table is a
one-hot matmul that runs on the MXU:

    interp(L, u) = (1-f) * onehot(i0) @ L + f * onehot(i0+1) @ L

XLA fuses the iota-compare one-hot generation into the dot's operand so
nothing (N, R)-shaped touches HBM; the cost is 4*N*R*C MXU FLOPs per
axis — ~1 ms per scale at the reference workload (N=262k, R=2048, C=32)
instead of ~10 ms of gathers for the VM planes or ~140 ms for the hash
grid. The one-hot entries are exact in bf16 and the interpolation
weights are applied in fp32 AFTER the matmul, so no positional
precision is lost to bf16 operands (table values round to bf16, same
as tcnn's fp16 tables).

Because the whole encode is plain XLA ops (no custom VJP), it is
differentiable at arbitrary order — the NeuS analytic-eikonal path
(reference: models/geometry.py:176-180) uses the same code as the
training hot path, unlike HashGrid/VM which must fall back to their
autodiff-scatter variants for second order.

Reference role: an alternative for tcnn's HashGrid encoding slot
(/root/reference/models/network_utils.py:90), selected with
``otype: CP`` (SURVEY.md §2b; TensoRF's CP decomposition, Chen et al.
2022, re-targeted at the TPU MXU).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CPSpec:
    """Static description of a CP line encoding (hashable)."""

    n_components: int = 64
    resolutions: tuple[int, ...] = (128, 2048)
    n_features: int = 16  # per-scale projected features; 0 = raw products

    @property
    def n_output_dims(self) -> int:
        per = self.n_features if self.n_features > 0 else self.n_components
        return len(self.resolutions) * per

    @classmethod
    def from_config(cls, config) -> "CPSpec":
        res = config.get("resolutions", [128, 2048])
        return cls(
            n_components=int(config.get("n_components", 64)),
            resolutions=tuple(int(r) for r in res),
            n_features=int(config.get("n_features", 16)),
        )


def cp_init(rng, spec: CPSpec, dtype=jnp.float32):
    """TensoRF-style init: 0.1*N(0,1) line factors (their product is
    ~1e-3, matching the hash table's small-init regime), orthonormal-ish
    projection basis."""
    params = {}
    n_keys = len(spec.resolutions) * 4
    keys = jax.random.split(rng, n_keys)
    ki = 0
    for s, r in enumerate(spec.resolutions):
        for ax in range(3):
            params[f"line_{s}_{ax}"] = (
                jax.random.normal(keys[ki], (r, spec.n_components), dtype) * 0.1
            )
            ki += 1
        if spec.n_features > 0:
            params[f"basis_{s}"] = jax.random.normal(
                keys[ki], (spec.n_components, spec.n_features), dtype
            ) / jnp.sqrt(jnp.float32(spec.n_components)).astype(dtype)
        ki += 1
    return params


def _line_interp(line, u, res: int):
    """Linear interp of N scalars against an (R, C) line table via two
    exact one-hot matmuls (MXU); fp32 weights applied post-matmul.

    Args:
      line: (R, C) table.
      u: (N,) coordinates in [0, 1] (clipped).
    Returns:
      (N, C) float32 interpolated rows.
    """
    p = jnp.clip(u.astype(jnp.float32), 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(p), 0.0, float(res - 2))
    f = (p - i0)[:, None]  # (N, 1), differentiable w.r.t. u
    iota = jnp.arange(res, dtype=jnp.float32)[None, :]  # (1, R)
    oh0 = (iota == i0[:, None]).astype(jnp.bfloat16)  # (N, R) exact
    oh1 = (iota == (i0[:, None] + 1.0)).astype(jnp.bfloat16)
    lb = line.astype(jnp.bfloat16)
    g0 = jnp.dot(oh0, lb, preferred_element_type=jnp.float32)
    g1 = jnp.dot(oh1, lb, preferred_element_type=jnp.float32)
    return (1.0 - f) * g0 + f * g1


def cp_encode(params, x, spec: CPSpec, impl: str = "xla"):
    """CP encode: positions (..., 3) in [0,1] -> (..., n_output_dims).

    impl:
      "xla": pure XLA (matmuls + elementwise) — arbitrary-order
        differentiable; the NeuS analytic-eikonal path uses this.
      "pallas": hand-written Pallas forward + backward
        (ops/cp_pallas.py) — measured on v5e at the bench workload
        (N=262k): fwd+bwd 7.5 ms vs 13.9 ms XLA (C=64, R=(128,2048));
        3.8 vs 7.7 ms (C=32, R=2048) — the (N, R) one-hot operands
        never touch HBM. First-order only (custom VJP), which covers
        training: the renderers need coordinate grads (provided) but
        not second-order.
    """
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    if impl == "pallas":
        from instant_nsr_pl_tpu.ops.cp_pallas import _supported, cp_product

        u3 = xf.astype(jnp.float32).T  # (3, N)
        outs = []
        for s, r in enumerate(spec.resolutions):
            if not _supported(r, spec.n_components):
                raise ValueError(
                    f"cp_encode impl='pallas' needs n_components divisible "
                    f"by 8; got C={spec.n_components} (use impl='xla')"
                )
            prod = cp_product(
                params[f"line_{s}_0"],
                params[f"line_{s}_1"],
                params[f"line_{s}_2"],
                u3,
                r,
            )  # (C, N)
            if spec.n_features > 0:
                prod = jnp.dot(
                    params[f"basis_{s}"].T.astype(jnp.bfloat16),
                    prod.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )  # (F, N)
            outs.append(prod)
        out = jnp.concatenate(outs, axis=0).T  # (N, n_output_dims)
        return out.reshape(*batch_shape, spec.n_output_dims).astype(x.dtype)
    outs = []
    for s, r in enumerate(spec.resolutions):
        g = _line_interp(params[f"line_{s}_0"], xf[:, 0], r)
        g = g * _line_interp(params[f"line_{s}_1"], xf[:, 1], r)
        g = g * _line_interp(params[f"line_{s}_2"], xf[:, 2], r)
        if spec.n_features > 0:
            g = jnp.dot(
                g.astype(jnp.bfloat16),
                params[f"basis_{s}"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        outs.append(g)
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*batch_shape, spec.n_output_dims).astype(x.dtype)


def cp_encode_with_jac(params, x, spec: CPSpec, impl: str = "pallas",
                       stacked: bool = False):
    """(encoded (N, E), d encoded / d x (3, N, E)) from ONE custom-VJP op
    per scale — the encoding half of the NeuS analytic-gradient contract
    (see models/geometry.py: the SDF gradient is chained through a plain
    VJP of the smooth MLP; the second-order graph never meets a custom op
    because the Jacobian is a forward OUTPUT here).

    impl 'pallas' routes through ops/cp_pallas.py ``cp_product_jac``
    (interpret mode off-TPU); 'xla' is the plain-ops twin (arbitrary-order
    differentiable, used for parity tests)."""
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    n = xf.shape[0]
    if impl == "pallas" and stacked:
        from instant_nsr_pl_tpu.ops.cp_pallas import (
            cp_jac_basis_stacked,
            stackable,
        )

        assert spec.n_features > 0 and stackable(spec), spec
        u3 = xf.astype(jnp.float32).T
        enc, jac = cp_jac_basis_stacked(params, u3, spec)  # (E, N), (3, E, N)
        return (
            enc.T.reshape(*batch_shape, spec.n_output_dims).astype(x.dtype),
            jac.transpose(0, 2, 1)
            .reshape(3, *batch_shape, spec.n_output_dims)
            .astype(x.dtype),
        )
    if impl == "pallas":
        from instant_nsr_pl_tpu.ops.cp_pallas import (
            cp_product_jac,
            cp_product_jac_basis,
        )

        u3 = xf.astype(jnp.float32).T
        outs, jacs = [], []
        for s, r in enumerate(spec.resolutions):
            if spec.n_features > 0:
                # basis projection fused into the kernel: (F, N)/(3, F, N)
                # outputs instead of (C, N)/(3, C, N) — 4x less Jacobian
                # HBM traffic at the flagship spec (C=64, F=16)
                prod, jacp = cp_product_jac_basis(
                    params[f"line_{s}_0"],
                    params[f"line_{s}_1"],
                    params[f"line_{s}_2"],
                    params[f"basis_{s}"],
                    u3,
                    r,
                )
            else:
                prod, jacp = cp_product_jac(
                    params[f"line_{s}_0"],
                    params[f"line_{s}_1"],
                    params[f"line_{s}_2"],
                    u3,
                    r,
                )  # (C, N), (3, C, N)
            outs.append(prod)
            jacs.append(jacp)
        enc = jnp.concatenate(outs, axis=0).T  # (N, E)
        jac = jnp.concatenate(jacs, axis=1).transpose(0, 2, 1)  # (3, N, E)
        return (
            enc.reshape(*batch_shape, spec.n_output_dims).astype(x.dtype),
            jac.reshape(3, *batch_shape, spec.n_output_dims).astype(x.dtype),
        )
    # XLA twin: value + the same closed-form Jacobian with plain ops
    enc = cp_encode(params, x, spec, impl="xla")

    def enc1(u):
        return cp_encode(params, u[None, :], spec, impl="xla")[0]

    jac = jax.vmap(jax.jacfwd(enc1))(xf)  # (N, E, 3)
    jac = jnp.moveaxis(jac, -1, 0)  # (3, N, E)
    return enc, jac.reshape(3, *batch_shape, spec.n_output_dims).astype(x.dtype)
