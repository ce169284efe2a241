"""Fused CP-encode -> basis -> MLP Pallas kernel (hand fwd + bwd).

The NeRF density evaluation (reference models/geometry.py:115-140 via the
tcnn ``NetworkWithInputEncoding`` slot, reference network_utils.py:207-214)
is encode -> project -> tiny MLP. Run separately (ops/cp_pallas.py +
ops/mlp.py) the seams cost real HBM traffic and dispatch glue: the (C, N)
products, the (N, E) encoding, and every MLP activation round-trip HBM,
plus transposes/concats between layouts (~3.5 ms of the 22.8 ms bench
step, PERF.md ablation). This kernel keeps the whole chain in VMEM per
sample block:

    v_ax,s = L_ax,s @ tent(u_ax)            (C, BN)   [MXU, per scale]
    prod_s = v_x,s * v_y,s * v_z,s          (C, BN)
    enc    = concat_s(B_s^T @ prod_s)       (E, BN)
    h_0    = relu(W_1^T @ enc + b_1)        (W, BN)
    ...
    out    = W_L^T @ h_{L-1} + b_L          (D, BN)

and the backward accumulates ALL parameter gradients (line tables, bases,
MLP weights/biases) in VMEM-resident f32 blocks across the sample grid
(the revisited-output pattern). The only fwd->bwd residuals are the bf16
``v`` stack and the bf16 hidden activations.

Position cotangents are intentionally NOT computed: density-path inputs
are pure functions of rays and march distances, never of parameters, so
d loss / d x is structurally unused (the renderer's only x-producers are
stop-gradient march outputs). The wrapper stop-gradients x to make that
contract explicit; paths that need coordinate gradients (NeuS analytic)
use ops/cp_pallas.py ``cp_product_jac`` instead. Dropping du removes the
diff-hot recompute matmul — a third of the encode backward's MXU work.

Precision contract: bf16 operands / f32 accumulators everywhere (same as
tcnn's fp16 tables + fp16 fused MLP, the reference's configuration at
configs/nerf-blender.yaml:44-66); tent weights round to bf16 inside the
operand exactly as ops/cp_pallas.py does.

Reference role: the fused "density/color evaluation ... hand-written
forward + backward" kernel of the project north star (BASELINE.md), on
the encode family where v5e hardware allows it (dense MXU work; see
PERF.md's Pallas-gather verdict for why not HashGrid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from instant_nsr_pl_tpu.ops.cp import CPSpec
from instant_nsr_pl_tpu.ops.cp_pallas import (
    _axis_p,
    _block_n,
    _lines_stack,
    _pad_n,
    _rpad,
    _stack_lines_fine,
    _supported,
    _tent,
    _upsample_matrix,
    stackable,
)
from instant_nsr_pl_tpu.ops.mlp_pallas_common import (
    kernel_mlp_bwd,
    kernel_mlp_fwd,
    make_acc,
    mlp_wmax,
    pack_mlp,
    unpack_mlp_grads,
)


def fusable(cp_spec: CPSpec, mlp_spec) -> bool:
    """Static check: can this (encoding, MLP) pair run in the fused kernel?"""
    dims_ok = (
        all(_supported(r, cp_spec.n_components) for r in cp_spec.resolutions)
        and cp_spec.n_features > 0
        and cp_spec.n_features % 8 == 0
        and mlp_spec.n_neurons % 8 == 0
        and mlp_spec.dim_out % 8 == 0
        and mlp_spec.dim_in == cp_spec.n_output_dims
        and mlp_spec.dim_out <= mlp_spec.n_neurons  # packed-width invariant
    )
    mlp_ok = (
        mlp_spec.activation.lower() == "relu"
        and mlp_spec.precision == "bf16"
        and not mlp_spec.weight_norm
        and not mlp_spec.sphere_init
        and mlp_spec.n_hidden_layers >= 1
    )
    return dims_ok and mlp_ok


def _block_n_fused(spec: CPSpec) -> int:
    return min(_block_n(r) for r in spec.resolutions)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(spec, n_hidden, refs):
    """refs layout (S = n scales, H = n_hidden):
    in:  lines_0..lines_{S-1} (3, C, R_s), basis (E, S*C),
         ws (sum of layer cols, Wmax) packed MLP weights, bs (L, Wmax),
         u (3, BN)
    out: out (D, BN) f32, vsave (3, S*C, BN) bf16, hsave (H, W, BN) bf16
    """
    s_count = len(spec.resolutions)
    lines_refs = refs[:s_count]
    basis_ref, ws_ref, bs_ref, u_ref = refs[s_count : s_count + 4]
    out_ref, v_ref, h_ref = refs[s_count + 4 :]
    c = spec.n_components
    bn = u_ref.shape[1]

    prods = []
    for s, res in enumerate(spec.resolutions):
        prod = None
        for ax in range(3):
            _, p = _axis_p(res, u_ref, ax)
            v = jax.lax.dot_general(
                lines_refs[s][ax], _tent(lines_refs[s].shape[2], p, bn),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, BN)
            v_ref[ax, pl.ds(s * c, c), :] = v.astype(jnp.bfloat16)
            prod = v if prod is None else prod * v
        prods.append(prod)
    prod_all = jnp.concatenate(prods, axis=0)  # (S*C, BN) f32

    enc = jax.lax.dot_general(
        basis_ref[...], prod_all.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (E, BN)

    out_ref[...] = kernel_mlp_fwd(
        ws_ref, bs_ref, enc, n_hidden, h_ref, out_ref.shape[0]
    )


def _bwd_kernel(spec, n_hidden, refs):
    """in:  lines (unused rows ok), basis, ws, bs, u, vsave, hsave, dout
    out: dbasis (E, S*C), dws (rows, Wmax), dbs (L, Wmax),
         dlines_0..{S-1} (3, C, R_s)   [all f32 VMEM accumulators]
    """
    s_count = len(spec.resolutions)
    basis_ref, ws_ref, u_ref, v_ref, h_ref, dout_ref = refs[:6]
    dbasis_ref, dws_ref, dbs_ref = refs[6:9]
    dlines_refs = refs[9:]
    c = spec.n_components
    e = basis_ref.shape[0]
    bn = u_ref.shape[1]
    acc = make_acc(pl.program_id(0))

    # ---- recompute enc from residuals
    v = v_ref[...].astype(jnp.float32)  # (3, S*C, BN)
    prod_all = v[0] * v[1] * v[2]
    enc = jax.lax.dot_general(
        basis_ref[...], prod_all.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (E, BN)

    d_enc = kernel_mlp_bwd(
        ws_ref, h_ref, enc, dout_ref[...], n_hidden, acc, dws_ref, dbs_ref
    )  # (E, BN)

    # ---- basis backward
    acc(
        dbasis_ref,
        jax.lax.dot_general(
            d_enc.astype(jnp.bfloat16), prod_all.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
    )
    d_prod = jax.lax.dot_general(
        basis_ref[...], d_enc.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S*C, BN)

    # ---- line-table backward per scale/axis (no du: see module docstring)
    for s, res in enumerate(spec.resolutions):
        vs = [v[ax, s * c : (s + 1) * c, :] for ax in range(3)]
        others = (vs[1] * vs[2], vs[0] * vs[2], vs[0] * vs[1])
        dp_s = d_prod[s * c : (s + 1) * c, :]
        for ax in range(3):
            _, p = _axis_p(res, u_ref, ax)
            d_v = dp_s * others[ax]
            contrib = jax.lax.dot_general(
                d_v.astype(jnp.bfloat16),
                _tent(dlines_refs[s].shape[2], p, bn),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, rpad(R_s))
            acc(dlines_refs[s], contrib, idx=(ax,))


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu",)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cp_mlp_apply(cp_params, mlp_params, x, cp_spec: CPSpec, mlp_spec):
    """Fused (CP encode -> basis -> bf16 ReLU MLP)(x): (..., 3) -> (..., D).

    Differentiable w.r.t. cp_params and mlp_params ONLY; x is treated as a
    constant (zero cotangent) — see module docstring. Callers must satisfy
    ``fusable(cp_spec, mlp_spec)``.
    """
    out, _, _ = _fwd_impl(cp_params, mlp_params, x, cp_spec, mlp_spec)
    return out


def _fwd_impl(cp_params, mlp_params, x, cp_spec, mlp_spec):
    batch_shape = x.shape[:-1]
    xf = jax.lax.stop_gradient(x).reshape(-1, 3)
    c = cp_spec.n_components
    s_count = len(cp_spec.resolutions)
    e = cp_spec.n_output_dims
    w_neurons = mlp_spec.n_neurons
    d_out = mlp_spec.dim_out
    n_hidden = mlp_spec.n_hidden_layers
    wmax = mlp_wmax(mlp_spec)
    bn = _block_n_fused(cp_spec)

    u3p, n = _pad_n(xf.astype(jnp.float32).T, bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn

    lines = [
        _lines_stack(
            cp_params[f"line_{s}_0"],
            cp_params[f"line_{s}_1"],
            cp_params[f"line_{s}_2"],
        )
        for s in range(s_count)
    ]
    # block-diagonal (E, S*C) basis: scale s's (C, F) block transposed into
    # rows [s*F:(s+1)*F], cols [s*C:(s+1)*C]
    f = cp_spec.n_features
    basis = jnp.zeros((e, s_count * c), jnp.float32)
    for s in range(s_count):
        basis = basis.at[s * f : (s + 1) * f, s * c : (s + 1) * c].set(
            cp_params[f"basis_{s}"].T
        )
    basis = basis.astype(jnp.bfloat16)
    ws, bs = pack_mlp(mlp_params, wmax)
    n_wrows = ws.shape[0]
    n_layers = n_hidden + 1

    in_specs = [
        pl.BlockSpec((3, c, _rpad(r)), lambda i: (0, 0, 0))
        for r in cp_spec.resolutions
    ] + [
        pl.BlockSpec((e, s_count * c), lambda i: (0, 0)),
        pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
        pl.BlockSpec((n_layers, wmax), lambda i: (0, 0)),
        pl.BlockSpec((3, bn), lambda i: (0, i)),
    ]
    out, vsave, hsave = pl.pallas_call(
        lambda *refs: _fwd_kernel(cp_spec, n_hidden, refs),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((d_out, bn), lambda i: (0, i)),
            pl.BlockSpec((3, s_count * c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((max(n_hidden, 1), w_neurons, bn), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_out, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, s_count * c, npad), jnp.bfloat16),
            jax.ShapeDtypeStruct((max(n_hidden, 1), w_neurons, npad), jnp.bfloat16),
        ],
        interpret=_interpret_default(),
    )(*lines, basis, ws, bs, u3p)
    out = out[:, :n].T.reshape(*batch_shape, d_out)
    return out, (u3p, n, vsave, hsave), (lines, basis, ws, bs)


def _cp_mlp_fwd(cp_params, mlp_params, x, cp_spec, mlp_spec):
    out, (u3p, n, vsave, hsave), _ = _fwd_impl(
        cp_params, mlp_params, x, cp_spec, mlp_spec
    )
    return out, (cp_params, mlp_params, u3p, n, vsave, hsave, x)


def _cp_mlp_bwd(cp_spec, mlp_spec, saved, dout):
    cp_params, mlp_params, u3p, n, vsave, hsave, x_saved = saved
    c = cp_spec.n_components
    s_count = len(cp_spec.resolutions)
    e = cp_spec.n_output_dims
    f = cp_spec.n_features
    w_neurons = mlp_spec.n_neurons
    d_out = mlp_spec.dim_out
    n_hidden = mlp_spec.n_hidden_layers
    wmax = mlp_wmax(mlp_spec)
    bn = _block_n_fused(cp_spec)
    npad = u3p.shape[1]
    nb = npad // bn

    dflat = dout.reshape(-1, d_out).T  # (D, N)
    dp = jnp.pad(dflat.astype(jnp.float32), ((0, 0), (0, npad - n)))

    lines = [
        _lines_stack(
            cp_params[f"line_{s}_0"],
            cp_params[f"line_{s}_1"],
            cp_params[f"line_{s}_2"],
        )
        for s in range(s_count)
    ]
    basis = jnp.zeros((e, s_count * c), jnp.float32)
    for s in range(s_count):
        basis = basis.at[s * f : (s + 1) * f, s * c : (s + 1) * c].set(
            cp_params[f"basis_{s}"].T
        )
    basis = basis.astype(jnp.bfloat16)
    ws, _ = pack_mlp(mlp_params, wmax)
    n_wrows = ws.shape[0]
    n_layers = n_hidden + 1

    in_specs = [
        pl.BlockSpec((e, s_count * c), lambda i: (0, 0)),
        pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
        pl.BlockSpec((3, bn), lambda i: (0, i)),
        pl.BlockSpec((3, s_count * c, bn), lambda i: (0, 0, i)),
        pl.BlockSpec((max(n_hidden, 1), w_neurons, bn), lambda i: (0, 0, i)),
        pl.BlockSpec((d_out, bn), lambda i: (0, i)),
    ]
    out_specs = [
        pl.BlockSpec((e, s_count * c), lambda i: (0, 0)),
        pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
        pl.BlockSpec((n_layers, wmax), lambda i: (0, 0)),
    ] + [
        pl.BlockSpec((3, c, _rpad(r)), lambda i: (0, 0, 0))
        for r in cp_spec.resolutions
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((e, s_count * c), jnp.float32),
        jax.ShapeDtypeStruct((n_wrows, wmax), jnp.float32),
        jax.ShapeDtypeStruct((n_layers, wmax), jnp.float32),
    ] + [
        jax.ShapeDtypeStruct((3, c, _rpad(r)), jnp.float32)
        for r in cp_spec.resolutions
    ]
    outs = pl.pallas_call(
        lambda *refs: _bwd_kernel(cp_spec, n_hidden, refs),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret_default(),
    )(basis, ws, u3p, vsave, hsave, dp)
    dbasis, dws, dbs, *dlines = outs

    d_cp = {}
    for s, r in enumerate(cp_spec.resolutions):
        for ax in range(3):
            d_cp[f"line_{s}_{ax}"] = dlines[s][ax, :, :r].T
        d_cp[f"basis_{s}"] = dbasis[
            s * f : (s + 1) * f, s * c : (s + 1) * c
        ].T
    d_mlp = unpack_mlp_grads(dws, dbs, mlp_params)
    dx = jnp.zeros_like(x_saved)
    return d_cp, d_mlp, dx


cp_mlp_apply.defvjp(_cp_mlp_fwd, _cp_mlp_bwd)


def _tent_product_reference(lx, ly, lz, u3, res):
    """Plain-XLA product with the KERNEL's precision (bf16 tent operand),
    so a ReLU downstream makes the same on/off decisions as the kernel —
    gradient parity tests need matched forwards, since a mask flip at
    z ~ 0 produces O(1) per-element gradient differences that are the
    (correct) gradients of two slightly different forwards."""
    out = None
    for ax, line in enumerate((lx, ly, lz)):
        p = jnp.clip(u3[ax], 0.0, 1.0) * (res - 1)
        iota = jnp.arange(res, dtype=jnp.float32)[None, :]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(iota - p[:, None])).astype(
            jnp.bfloat16
        )  # (N, R)
        v = jnp.dot(
            w, line.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ).T  # (C, N)
        out = v if out is None else out * v
    return out


def cp_mlp_reference(cp_params, mlp_params, x, cp_spec: CPSpec, mlp_spec):
    """Plain-XLA twin with the SAME precision contract as the kernel
    (bf16 tent interpolation weights) — used by parity tests."""
    from instant_nsr_pl_tpu.ops.mlp import mlp_apply

    xf = x.reshape(-1, 3)
    outs = []
    for s, r in enumerate(cp_spec.resolutions):
        prod = _tent_product_reference(
            cp_params[f"line_{s}_0"],
            cp_params[f"line_{s}_1"],
            cp_params[f"line_{s}_2"],
            xf.astype(jnp.float32).T,
            r,
        )  # (C, N)
        outs.append(
            jnp.dot(
                cp_params[f"basis_{s}"].T.astype(jnp.bfloat16),
                prod.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        )
    enc = jnp.concatenate(outs, axis=0).T  # (N, E)
    out = mlp_apply(mlp_params, enc, mlp_spec)
    return out.reshape(*x.shape[:-1], mlp_spec.dim_out)


# ---------------------------------------------------------------------------
# stacked-scales variant: exact piecewise-linear upsampling onto one grid
# ---------------------------------------------------------------------------
#
# A (C, R) x (R, BN) matmul with C=64 leaves half the MXU's 128 LHS rows
# idle. When every scale's knots are nested in the finest grid — i.e.
# (R_max - 1) % (R_s - 1) == 0 for all s — a coarse line upsamples onto the
# fine grid EXACTLY (a piecewise-linear function re-sampled at a superset
# of its knots is the same function), so all S scales stack along the C
# dimension into ONE (S*C, R_max) table sharing ONE tent operand per axis:
# full MXU width, one tent generation instead of S, and the coarse scales'
# separate passes disappear. Gradients flow back through the (fixed,
# sparse) upsample matrix: d coarse = d fine @ U. Selected by
# ``cp_mlp_apply(..., stacked=True)`` (CPEncoding config `stack_scales`);
# requires nested resolutions, e.g. (129, 2049) instead of (128, 2048).


def _fwd_kernel_stacked(rmax, n_hidden, *refs):
    lines_ref, basis_ref, ws_ref, bs_ref, u_ref, out_ref, v_ref, h_ref = refs
    bn = u_ref.shape[1]
    prod = None
    for ax in range(3):
        _, p = _axis_p(rmax, u_ref, ax)
        v = jax.lax.dot_general(
            lines_ref[ax], _tent(lines_ref.shape[2], p, bn),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S*C, BN)
        v_ref[ax] = v.astype(jnp.bfloat16)
        prod = v if prod is None else prod * v
    enc = jax.lax.dot_general(
        basis_ref[...], prod.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = kernel_mlp_fwd(
        ws_ref, bs_ref, enc, n_hidden, h_ref, out_ref.shape[0]
    )


def _bwd_kernel_stacked(rmax, n_hidden, *refs):
    (basis_ref, ws_ref, u_ref, v_ref, h_ref, dout_ref,
     dbasis_ref, dws_ref, dbs_ref, dlines_ref) = refs
    bn = u_ref.shape[1]
    acc = make_acc(pl.program_id(0))
    v = v_ref[...].astype(jnp.float32)  # (3, S*C, BN)
    prod_all = v[0] * v[1] * v[2]
    enc = jax.lax.dot_general(
        basis_ref[...], prod_all.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_enc = kernel_mlp_bwd(
        ws_ref, h_ref, enc, dout_ref[...], n_hidden, acc, dws_ref, dbs_ref
    )
    acc(
        dbasis_ref,
        jax.lax.dot_general(
            d_enc.astype(jnp.bfloat16), prod_all.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
    )
    d_prod = jax.lax.dot_general(
        basis_ref[...], d_enc.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S*C, BN)
    others = (v[1] * v[2], v[0] * v[2], v[0] * v[1])
    for ax in range(3):
        _, p = _axis_p(rmax, u_ref, ax)
        d_v = d_prod * others[ax]
        contrib = jax.lax.dot_general(
            d_v.astype(jnp.bfloat16), _tent(dlines_ref.shape[2], p, bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S*C, rpad)
        acc(dlines_ref, contrib, idx=(ax,))


def _fwd_impl_stacked(cp_params, mlp_params, x, cp_spec, mlp_spec):
    batch_shape = x.shape[:-1]
    xf = jax.lax.stop_gradient(x).reshape(-1, 3)
    c = cp_spec.n_components
    s_count = len(cp_spec.resolutions)
    e = cp_spec.n_output_dims
    f = cp_spec.n_features
    rmax = max(cp_spec.resolutions)
    rpad = -(-rmax // 8) * 8
    wmax = mlp_wmax(mlp_spec)
    n_hidden = mlp_spec.n_hidden_layers
    d_out = mlp_spec.dim_out
    bn = _block_n(rmax)

    u3p, n = _pad_n(xf.astype(jnp.float32).T, bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn

    lines = _stack_lines_fine(cp_params, cp_spec, rpad)
    basis = jnp.zeros((e, s_count * c), jnp.float32)
    for s in range(s_count):
        basis = basis.at[s * f : (s + 1) * f, s * c : (s + 1) * c].set(
            cp_params[f"basis_{s}"].T
        )
    basis = basis.astype(jnp.bfloat16)
    ws, bs = pack_mlp(mlp_params, wmax)
    n_wrows = ws.shape[0]
    n_layers = n_hidden + 1

    out, vsave, hsave = pl.pallas_call(
        functools.partial(_fwd_kernel_stacked, rmax, n_hidden),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, s_count * c, rpad), lambda i: (0, 0, 0)),
            pl.BlockSpec((e, s_count * c), lambda i: (0, 0)),
            pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
            pl.BlockSpec((n_layers, wmax), lambda i: (0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((d_out, bn), lambda i: (0, i)),
            pl.BlockSpec((3, s_count * c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((max(n_hidden, 1), mlp_spec.n_neurons, bn),
                         lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_out, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, s_count * c, npad), jnp.bfloat16),
            jax.ShapeDtypeStruct(
                (max(n_hidden, 1), mlp_spec.n_neurons, npad), jnp.bfloat16
            ),
        ],
        interpret=_interpret_default(),
    )(lines, basis, ws, bs, u3p)
    out = out[:, :n].T.reshape(*batch_shape, d_out)
    return out, (u3p, n, vsave, hsave)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cp_mlp_apply_stacked(cp_params, mlp_params, x, cp_spec: CPSpec, mlp_spec):
    """Stacked-scales fused density eval; requires ``stackable(cp_spec)``.
    Same contract as ``cp_mlp_apply`` (x gets a zero cotangent)."""
    out, _ = _fwd_impl_stacked(cp_params, mlp_params, x, cp_spec, mlp_spec)
    return out


def _cp_mlp_stacked_fwd(cp_params, mlp_params, x, cp_spec, mlp_spec):
    out, (u3p, n, vsave, hsave) = _fwd_impl_stacked(
        cp_params, mlp_params, x, cp_spec, mlp_spec
    )
    return out, (cp_params, mlp_params, u3p, n, vsave, hsave, x)


def _cp_mlp_stacked_bwd(cp_spec, mlp_spec, saved, dout):
    cp_params, mlp_params, u3p, n, vsave, hsave, x_saved = saved
    c = cp_spec.n_components
    s_count = len(cp_spec.resolutions)
    e = cp_spec.n_output_dims
    f = cp_spec.n_features
    rmax = max(cp_spec.resolutions)
    rpad = -(-rmax // 8) * 8
    wmax = mlp_wmax(mlp_spec)
    n_hidden = mlp_spec.n_hidden_layers
    d_out = mlp_spec.dim_out
    bn = _block_n(rmax)
    npad = u3p.shape[1]
    nb = npad // bn

    dp = jnp.pad(
        dout.reshape(-1, d_out).astype(jnp.float32).T, ((0, 0), (0, npad - n))
    )
    basis = jnp.zeros((e, s_count * c), jnp.float32)
    for s in range(s_count):
        basis = basis.at[s * f : (s + 1) * f, s * c : (s + 1) * c].set(
            cp_params[f"basis_{s}"].T
        )
    basis = basis.astype(jnp.bfloat16)
    ws, _ = pack_mlp(mlp_params, wmax)
    n_wrows = ws.shape[0]
    n_layers = n_hidden + 1

    dbasis, dws, dbs, dlines = pl.pallas_call(
        functools.partial(_bwd_kernel_stacked, rmax, n_hidden),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((e, s_count * c), lambda i: (0, 0)),
            pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((3, s_count * c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((max(n_hidden, 1), mlp_spec.n_neurons, bn),
                         lambda i: (0, 0, i)),
            pl.BlockSpec((d_out, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((e, s_count * c), lambda i: (0, 0)),
            pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
            pl.BlockSpec((n_layers, wmax), lambda i: (0, 0)),
            pl.BlockSpec((3, s_count * c, rpad), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e, s_count * c), jnp.float32),
            jax.ShapeDtypeStruct((n_wrows, wmax), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, wmax), jnp.float32),
            jax.ShapeDtypeStruct((3, s_count * c, rpad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(basis, ws, u3p, vsave, hsave, dp)

    d_cp = {}
    for s, r in enumerate(cp_spec.resolutions):
        for ax in range(3):
            dl_fine = dlines[ax, s * c : (s + 1) * c, :rmax]  # (C, rmax)
            if r != rmax:
                dl = (dl_fine @ _upsample_matrix(r, rmax)).T  # (R_s, C)
            else:
                dl = dl_fine.T
            d_cp[f"line_{s}_{ax}"] = dl
        d_cp[f"basis_{s}"] = dbasis[
            s * f : (s + 1) * f, s * c : (s + 1) * c
        ].T
    d_mlp = unpack_mlp_grads(dws, dbs, mlp_params)
    return d_cp, d_mlp, jnp.zeros_like(x_saved)


cp_mlp_apply_stacked.defvjp(_cp_mlp_stacked_fwd, _cp_mlp_stacked_bwd)
