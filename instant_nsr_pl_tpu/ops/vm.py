"""Vector-Matrix factorized encoding (TensoRF-style), designed TPU-first.

A fewer-tap alternative to the multiresolution hash grid: instead of
L*8 = 128 random table gathers per sample (the hash grid's cost profile,
see PERF.md), a VM encoding reads

- 3 factor planes  P_xy, P_xz, P_yz : (R^2, C) tables, bilinear = 4 taps,
- 3 factor lines   L_z,  L_y,  L_x  : (R_l, C) tables, linear   = 2 taps,

i.e. 18 gathers/sample — ~7x fewer random-access ops, which is the only
cost knob for gathers on TPU (XLA's gather is ~5.4 ns/row regardless of
width/locality; measured in scripts/microbench_pallas.py). Features are
``concat_k( P_k(a,b) * L_k(c) )`` per scale (the VM decomposition of
TensoRF), optionally over several plane scales.

Backward: the table gradients are segment-sums of weighted cotangents.
XLA lowers scatter-add to a serial loop on TPU (~58 ns/update), so the
fast path computes them scatter-free with the two-sort sentinel trick:
sort (row, update) with one zero-valued sentinel per table row keyed to
sort after its updates, inclusive-cumsum, then a second sort brings the
per-row cumsums to the front in row order; adjacent differences are the
dense gradient. Two vectorized sorts (~1.7 ns/elt) instead of M serial
scatter updates.

Reference role: this replaces tcnn's HashGrid encoding slot
(/root/reference/models/network_utils.py:90); it is offered alongside
HashGrid via ``otype: VectorMatrix`` (SURVEY.md §2b).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from instant_nsr_pl_tpu.ops.segment import segment_sum_dense_sorted


@dataclasses.dataclass(frozen=True)
class VMSpec:
    """Static description of a VM encoding (hashable)."""

    n_components: int = 16
    plane_resolution: int = 512
    line_resolution: int = 2048
    n_scales: int = 1
    scale_factor: float = 2.0  # plane res of scale s = R / factor^s

    # plane k pairs axes (a, b); its line runs along the third axis c
    AXES = ((0, 1, 2), (0, 2, 1), (1, 2, 0))

    def plane_res(self, s: int) -> int:
        return max(8, int(round(self.plane_resolution / self.scale_factor**s)))

    @property
    def n_output_dims(self) -> int:
        return self.n_scales * 3 * self.n_components

    @classmethod
    def from_config(cls, config) -> "VMSpec":
        return cls(
            n_components=int(config.get("n_components", 16)),
            plane_resolution=int(config.get("plane_resolution", 512)),
            line_resolution=int(config.get("line_resolution", 2048)),
            n_scales=int(config.get("n_scales", 1)),
            scale_factor=float(config.get("scale_factor", 2.0)),
        )


def vm_init(rng, spec: VMSpec, dtype=jnp.float32):
    """TensoRF-style init: 0.1*N(0,1) planes, lines biased to 1 so the
    product starts plane-dominated but lines can modulate either way."""
    params = {}
    keys = jax.random.split(rng, spec.n_scales * 6)
    ki = 0
    for s in range(spec.n_scales):
        rp = spec.plane_res(s)
        for k in range(3):
            params[f"plane_{s}_{k}"] = (
                jax.random.normal(keys[ki], (rp * rp, spec.n_components), dtype)
                * 0.1
            )
            ki += 1
            params[f"line_{s}_{k}"] = (
                jnp.ones((spec.line_resolution, spec.n_components), dtype)
                + jax.random.normal(
                    keys[ki], (spec.line_resolution, spec.n_components), dtype
                )
                * 0.1
            )
            ki += 1
    return params


def _interp_rows_weights_1d(u, res):
    """u in [0,1] -> (i0, i1, w1): linear interp rows + weight of i1."""
    p = jnp.clip(u, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, res - 2)
    w1 = p - i0.astype(jnp.float32)
    return i0, i0 + 1, w1


def _plane_taps(x, axes, res):
    """Bilinear taps of one plane: 4 row ids (4, N) + weights (4, N)."""
    a, b, _ = axes
    ia0, ia1, wa = _interp_rows_weights_1d(x[..., a], res)
    ib0, ib1, wb = _interp_rows_weights_1d(x[..., b], res)
    rows = jnp.stack(
        [
            ia0 * res + ib0,
            ia0 * res + ib1,
            ia1 * res + ib0,
            ia1 * res + ib1,
        ]
    )
    w = jnp.stack(
        [(1 - wa) * (1 - wb), (1 - wa) * wb, wa * (1 - wb), wa * wb]
    )
    return rows, w


def _line_taps(x, axes, res):
    c = axes[2]
    i0, i1, w1 = _interp_rows_weights_1d(x[..., c], res)
    return jnp.stack([i0, i1]), jnp.stack([1.0 - w1, w1])


def _gather_weighted(table, rows, w):
    """sum_t w[t] * table[rows[t]] for tap stacks (T, N) -> (N, C)."""
    g = jnp.take(table, rows, axis=0)  # (T, N, C)
    return (g * w[..., None].astype(table.dtype)).sum(axis=0)


def vm_encode(params, x, spec: VMSpec):
    """Autodiff VM encode: positions (..., 3) in [0,1] -> (..., n_out).

    Differentiable at arbitrary order (needed when the NeuS analytic
    eikonal loss backprops through encoding gradients); its table
    gradient lowers to XLA scatter-add, so the training hot path uses
    :func:`vm_encode_fast`.
    """
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    outs = []
    for s in range(spec.n_scales):
        rp = spec.plane_res(s)
        for k, axes in enumerate(VMSpec.AXES):
            prow, pw = _plane_taps(xf, axes, rp)
            lrow, lw = _line_taps(xf, axes, spec.line_resolution)
            pf = _gather_weighted(params[f"plane_{s}_{k}"], prow, pw)
            lf = _gather_weighted(params[f"line_{s}_{k}"], lrow, lw)
            outs.append(pf * lf)
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*batch_shape, spec.n_output_dims)


# ---------------------------------------------------------------------------
# Fast path: custom VJP with sort-based (scatter-free) table gradients
# (segment_sum_dense_sorted in ops/segment.py, shared with the hash grid)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def vm_encode_fast(params, x, spec: VMSpec):
    """First-order VM encoding with sort-based table gradients (training
    hot path; the tcnn-backward atomic-scatter role)."""
    return vm_encode(params, x, spec)


def _vm_fast_fwd(params, x, spec):
    return vm_encode(params, x, spec), (params, x)


def _vm_fast_bwd(spec, res, ct):
    params, x = res
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    n = xf.shape[0]
    c = spec.n_components
    ct2 = ct.reshape(n, spec.n_scales * 3, c)

    dparams = {}
    dx = jnp.zeros_like(xf)
    comp = 0
    for s in range(spec.n_scales):
        rp = spec.plane_res(s)
        for k, axes in enumerate(VMSpec.AXES):
            a, b, cax = axes
            g = ct2[:, comp, :]  # (N, C)
            comp += 1
            prow, pw = _plane_taps(xf, axes, rp)
            lrow, lw = _line_taps(xf, axes, spec.line_resolution)
            ptab = params[f"plane_{s}_{k}"]
            ltab = params[f"line_{s}_{k}"]
            pf = _gather_weighted(ptab, prow, pw)  # (N, C)
            lf = _gather_weighted(ltab, lrow, lw)  # (N, C)

            # d plane: updates (4N, C) = pw * (g * lf) at prow
            gl = (g * lf).astype(jnp.float32)
            upd_p = (pw[..., None] * gl[None]).reshape(4 * n, c)
            dparams[f"plane_{s}_{k}"] = segment_sum_dense_sorted(
                prow.reshape(4 * n), upd_p, rp * rp
            ).astype(ptab.dtype)
            # d line: updates (2N, C) = lw * (g * pf) at lrow
            gp = (g * pf).astype(jnp.float32)
            upd_l = (lw[..., None] * gp[None]).reshape(2 * n, c)
            dparams[f"line_{s}_{k}"] = segment_sum_dense_sorted(
                lrow.reshape(2 * n), upd_l, spec.line_resolution
            ).astype(ltab.dtype)

            # dx: analytic through the interpolation weights
            gp_tap = jnp.einsum(
                "tnc,nc->tn", jnp.take(ptab, prow, axis=0).astype(jnp.float32), gl
            )  # (4, N): per-tap (P_corner . g*lf)
            gl_tap = jnp.einsum(
                "tnc,nc->tn", jnp.take(ltab, lrow, axis=0).astype(jnp.float32), gp
            )  # (2, N)
            pa = jnp.clip(xf[:, a], 0.0, 1.0) * (rp - 1)
            pb = jnp.clip(xf[:, b], 0.0, 1.0) * (rp - 1)
            wa = pa - jnp.clip(jnp.floor(pa), 0, rp - 2)
            wb = pb - jnp.clip(jnp.floor(pb), 0, rp - 2)
            # dw/dwa for taps [(1-wa)(1-wb), (1-wa)wb, wa(1-wb), wa wb]
            # tap order is (ia0ib0, ia0ib1, ia1ib0, ia1ib1)
            dw_da = jnp.stack([-(1 - wb), -wb, (1 - wb), wb]) * (rp - 1)
            dw_db = jnp.stack([-(1 - wa), (1 - wa), -wa, wa]) * (rp - 1)
            in_a = (xf[:, a] > 0) & (xf[:, a] < 1)
            in_b = (xf[:, b] > 0) & (xf[:, b] < 1)
            dx = dx.at[:, a].add((dw_da * gp_tap).sum(0) * in_a)
            dx = dx.at[:, b].add((dw_db * gp_tap).sum(0) * in_b)
            rl = spec.line_resolution
            in_c = (xf[:, cax] > 0) & (xf[:, cax] < 1)
            dw_dc = jnp.stack([-jnp.ones((n,)), jnp.ones((n,))]) * (rl - 1)
            dx = dx.at[:, cax].add((dw_dc * gl_tap).sum(0) * in_c)

    return dparams, dx.reshape(*batch_shape, 3).astype(x.dtype)


vm_encode_fast.defvjp(_vm_fast_fwd, _vm_fast_bwd)
