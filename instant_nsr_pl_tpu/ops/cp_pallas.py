"""Pallas TPU kernel for the CP line-encoding product — hand-written
forward + backward.

Why this exists: the XLA formulation of the CP encode (ops/cp.py) is
HBM-bound, not MXU-bound — XLA materializes the (N, R) one-hot operands
in HBM (~1 GB each at the bench workload: N=262k, R=2048, bf16), so the
measured 5.6 ms forward is exactly the ~4.5 GB of one-hot traffic at
819 GB/s (PERF.md). This kernel generates each interpolation operand on
the VPU directly in VMEM, feeds it to the MXU, and never spills it: the
only HBM traffic is the inputs, the (C, N) outputs, and one bf16
(3, C, N) residual. The backward accumulates the (C, R) table gradients
in a VMEM-resident f32 block across the sample grid (the Pallas
revisited-output pattern), replacing XLA's equally HBM-bound one-hot
cotangent matmuls.

Math (identical to ops/cp.py `_line_interp` + axis product):

    v_ax  = (1 - f) * L_ax[i0] + f * L_ax[i0 + 1]        (C, N)
    prod  = v_x * v_y * v_z                               (C, N)

The interpolation runs as ONE (C, R) x (R, BN) matmul per axis against
the TENT operand

    w_r(p) = max(0, 1 - |r - p|)          (R, BN), == (1-f) at i0, f at i0+1

which is exactly the linear-interpolation kernel — half the MXU FLOPs of
the earlier concatenated-table formulation (g0/g1 rows via a (2C, R)
matmul), and the kernel is MXU-bound (~51% of the bf16 roofline at the
bench workload). Cost of the halving: the interpolation weights now
round to bf16 inside the operand (the earlier split applied f in f32
post-matmul), adding ~2^-9 relative weight error on top of the bf16
table rounding both formulations share — the same precision contract as
tcnn's fp16 tables + fp16 weights (the reference's encoding,
models/network_utils.py:90).

Gradients (per axis; s = (res-1) * inrange, other = prod of the other
two axes' v):

    d L    += d_v @ w^T                      (C, R)   [one bf16 matmul]
    gd      = L^T @ dh,  dh = onehot(i0+1) - onehot(i0)   [exact in bf16]
    d u     = sum_C d_v * gd * s             (zero outside [0,1];
                                              0.5 at exact boundary ties,
                                              matching jnp.clip)

`gd` is recomputed in the backward from the resident table (one extra
C-row matmul — total backward FLOPs unchanged vs the concatenated form)
instead of being saved from the forward: the bf16 (3, C, N) v residual
is the only forward->backward traffic (4x less than saving v+gd in f32).

Reference role: the tcnn-encoding slot (reference
models/network_utils.py:90) — this is the "hand-written Pallas
forward + backward" kernel of the project north star, placed where a
Pallas kernel actually beats XLA on v5e (dense MXU work with operand
generation fused in VMEM), not at random-access gathers where it cannot
(PERF.md Pallas-gather verdict).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _block_n(res: int) -> int:
    """Sample-block size: keep the (R, BN) bf16 tent operand + the
    (3, C, R) f32 gradient accumulator comfortably inside ~16 MB of VMEM."""
    if res <= 2048:
        return 1024
    if res <= 4096:
        return 256
    return 128


def _supported(res: int, c: int) -> bool:
    # feature dim must tile; any resolution works (tables are zero-padded
    # to a multiple of 8 rows host-side — the tent/diffhot operands are
    # provably zero on rows >= res since p <= res-1, so padded rows never
    # contribute and never receive gradient)
    return c % 8 == 0


def _rpad(res: int) -> int:
    return -(-res // 8) * 8


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _axis_p(res, u_ref, ax):
    """(1, BN) clipped grid-space coordinate for axis `ax`."""
    u_ax = u_ref[pl.ds(ax, 1), :]  # (1, BN) f32
    p = jnp.clip(u_ax, 0.0, 1.0) * (res - 1)
    return u_ax, p


def _tent(res, p, bn):
    """(R, BN) bf16 tent operand: (1-f) at i0, f at i0+1, 0 elsewhere."""
    # tpu.iota is integer-only; cast after (Mosaic lowering restriction)
    iota = jax.lax.broadcasted_iota(jnp.int32, (res, bn), 0).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(iota - p)).astype(jnp.bfloat16)


def _diffhot(res, p, bn):
    """(R, BN) bf16 exact +-1 operand: +1 at i0+1, -1 at i0 — d tent/d p
    with the same i0 = min(floor(p), res-2) convention as the XLA path
    (right-derivative at exact interior grid points)."""
    i0 = jnp.minimum(jnp.floor(p), res - 2)  # (1, BN) f32, exact
    iota = jax.lax.broadcasted_iota(jnp.int32, (res, bn), 0).astype(jnp.float32)
    return (
        (iota == (i0 + 1.0)).astype(jnp.float32)
        - (iota == i0).astype(jnp.float32)
    ).astype(jnp.bfloat16)


def _inrange_half(u_ax):
    """d clip(u)/d u with the XLA path's 50/50 boundary-tie convention."""
    return jnp.where(
        (u_ax < 0.0) | (u_ax > 1.0),
        0.0,
        jnp.where((u_ax == 0.0) | (u_ax == 1.0), 0.5, 1.0),
    )


def _fwd_kernel(res, c, lines_ref, u_ref, prod_ref, v_ref):
    # All 3 axes unrolled in one body: the (3, C, R) table stack stays
    # VMEM-resident across the whole sample grid (its index map is
    # constant) and each sample block makes exactly one pass — no
    # read-modify-write prod revisits, 3x fewer grid steps.
    bn = u_ref.shape[1]
    prod = None
    rows = lines_ref.shape[2]
    for ax in range(3):
        _, p = _axis_p(res, u_ref, ax)
        w = _tent(rows, p, bn)
        v = jax.lax.dot_general(
            lines_ref[ax], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, BN) f32
        v_ref[ax] = v.astype(jnp.bfloat16)
        prod = v if prod is None else prod * v
    prod_ref[...] = prod


def _bwd_kernel(res, c, lines_ref, u_ref, v_ref, dp_ref, dl_ref, du_ref):
    i = pl.program_id(0)
    bn = u_ref.shape[1]
    dp = dp_ref[...]  # (C, BN) f32
    v0 = v_ref[0].astype(jnp.float32)
    v1 = v_ref[1].astype(jnp.float32)
    v2 = v_ref[2].astype(jnp.float32)
    others = (v1 * v2, v0 * v2, v0 * v1)
    for ax in range(3):
        u_ax, p = _axis_p(res, u_ref, ax)
        d_v = dp * others[ax]  # (C, BN) f32

        # d u: gd recomputed from the resident table via the exact
        # diff-hot operand (one C-row matmul)
        gd = jax.lax.dot_general(
            lines_ref[ax], _diffhot(lines_ref.shape[2], p, bn),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, BN)
        du_ref[pl.ds(ax, 1), :] = (
            jnp.sum(d_v * gd, axis=0, keepdims=True)
            * (res - 1)
            * _inrange_half(u_ax)
        )

        # d L, accumulated in a VMEM-resident f32 block across the
        # sample grid (revisited-output pattern)
        contrib = jax.lax.dot_general(
            d_v.astype(jnp.bfloat16), _tent(dl_ref.shape[2], p, bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, R)

        @pl.when(i == 0)
        def _():
            dl_ref[ax] = contrib

        @pl.when(i > 0)
        def _():
            dl_ref[ax] = dl_ref[ax] + contrib


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _interpret_default() -> bool:
    # tests run CPU-pinned; interpret mode executes the same kernel logic
    return jax.default_backend() not in ("tpu",)


def _lines_stack(lx, ly, lz):
    """(3, C, rpad(R)) bf16 table stack (feature-major rows feed the MXU);
    rows beyond R are zero padding (see _supported)."""
    stack = jnp.stack([lx.T, ly.T, lz.T])
    res = stack.shape[2]
    pad = _rpad(res) - res
    if pad:
        stack = jnp.pad(stack, ((0, 0), (0, 0), (0, pad)))
    return stack.astype(jnp.bfloat16)


def _pad_n(a, bn, fill):
    n = a.shape[-1]
    pad = (-n) % bn
    if pad == 0:
        return a, n
    width = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, width, constant_values=fill), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def cp_product(lx, ly, lz, u3, res):
    """prod (C, N) = interp_x * interp_y * interp_z on the MXU in VMEM.

    Args:
      lx, ly, lz: (R, C) f32 line tables.
      u3: (3, N) f32 coordinates in [0, 1] (clipped).
      res: static R.
    """
    prod, _ = _cp_product_fwd_impl(lx, ly, lz, u3, res)
    return prod


def _cp_product_fwd_impl(lx, ly, lz, u3, res):
    c = lx.shape[1]
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    lines = _lines_stack(lx, ly, lz)

    prod, vsave = pl.pallas_call(
        functools.partial(_fwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((c, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, c, npad), jnp.bfloat16),
        ],
        interpret=_interpret_default(),
    )(lines, u3p)
    return prod[:, :n], vsave


def _cp_product_fwd(lx, ly, lz, u3, res):
    prod, vsave = _cp_product_fwd_impl(lx, ly, lz, u3, res)
    return prod, (lx, ly, lz, u3, vsave)


def _cp_product_bwd(res, saved, dprod):
    lx, ly, lz, u3, vsave = saved
    c = lx.shape[1]
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    dp = jnp.pad(dprod, ((0, 0), (0, npad - n)))  # zero ct for padding
    lines = _lines_stack(lx, ly, lz)

    dl, du = pl.pallas_call(
        functools.partial(_bwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((c, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, c, _rpad(res)), jnp.float32),
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(lines, u3p, vsave, dp)

    return (
        dl[0, :, :res].T, dl[1, :, :res].T, dl[2, :, :res].T, du[:, :n]
    )


cp_product.defvjp(_cp_product_fwd, _cp_product_bwd)


def cp_product_reference(lx, ly, lz, u3, res):
    """Plain-XLA twin of ``cp_product`` for parity tests (same math)."""
    out = None
    for ax, line in enumerate((lx, ly, lz)):
        p = jnp.clip(u3[ax], 0.0, 1.0) * (res - 1)
        i0 = jnp.minimum(jnp.floor(p), res - 2)
        f = p - i0
        iota = jnp.arange(res, dtype=jnp.float32)[None, :]
        oh0 = (iota == i0[:, None]).astype(jnp.bfloat16)
        oh1 = (iota == (i0[:, None] + 1.0)).astype(jnp.bfloat16)
        lb = line.astype(jnp.bfloat16)
        g0 = jnp.dot(oh0, lb, preferred_element_type=jnp.float32)
        g1 = jnp.dot(oh1, lb, preferred_element_type=jnp.float32)
        v = ((1.0 - f[:, None]) * g0 + f[:, None] * g1).T  # (C, N)
        out = v if out is None else out * v
    return out


# ---------------------------------------------------------------------------
# product + analytic Jacobian (the NeuS analytic-gradient hot path)
# ---------------------------------------------------------------------------


def _jac_fwd_kernel(res, c, lines_ref, u_ref, prod_ref, jac_ref, v_ref, gd_ref):
    """prod = v0*v1*v2 and jac_a = gd_a * (res-1) * inrange_a * prod_{b!=a} v_b
    in one pass (v via the tent matmul, gd via the exact diff-hot matmul —
    same total FLOPs as the concatenated-table form); saves bf16 v and gd
    residuals for the backward."""
    bn = u_ref.shape[1]
    vs, gs = [], []
    for ax in range(3):
        u_ax, p = _axis_p(res, u_ref, ax)
        rows = lines_ref.shape[2]
        v = jax.lax.dot_general(
            lines_ref[ax], _tent(rows, p, bn), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gd = jax.lax.dot_general(
            lines_ref[ax], _diffhot(rows, p, bn), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v_ref[ax] = v.astype(jnp.bfloat16)
        gd_ref[ax] = gd.astype(jnp.bfloat16)
        vs.append(v)
        gs.append(gd * ((res - 1) * _inrange_half(u_ax)))
    prod_ref[...] = vs[0] * vs[1] * vs[2]
    jac_ref[0] = gs[0] * (vs[1] * vs[2])
    jac_ref[1] = gs[1] * (vs[0] * vs[2])
    jac_ref[2] = gs[2] * (vs[0] * vs[1])


def _jac_bwd_kernel(
    res, c, lines_ref, u_ref, v_ref, gd_ref, dp_ref, dj_ref, dl_ref, du_ref
):
    """Cotangents (d prod, d jac) -> (d line tables, d u).

    With s_a = (res-1)*inrange_a and other_a = prod_{b!=a} v_b:
      d v_a  = dp * other_a + sum_{c!=a} dj_c * gd_c * s_c * prod_{b!=a,c} v_b
      d gd_a (jac-only part) = dj_a * s_a * other_a
      d L_a += d v_a @ tent_a^T + d gd_a @ diffhot_a^T
      d u_a  = sum_C (d v_a * gd_a) * s_a      (i0/inrange are p.c. => 0 a.e.)
    """
    i = pl.program_id(0)
    bn = u_ref.shape[1]
    dp = dp_ref[...]
    v = [v_ref[ax].astype(jnp.float32) for ax in range(3)]
    gd = [gd_ref[ax].astype(jnp.float32) for ax in range(3)]
    u_axs, ps, ss = [], [], []
    for ax in range(3):
        u_ax, p = _axis_p(res, u_ref, ax)
        u_axs.append(u_ax)
        ps.append(p)
        ss.append((res - 1) * _inrange_half(u_ax))
    others = (v[1] * v[2], v[0] * v[2], v[0] * v[1])
    gs = [dj_ref[ax] * gd[ax] * ss[ax] for ax in range(3)]  # dj_c*gd_c*s_c
    for ax in range(3):
        b1, b2 = [b for b in range(3) if b != ax]
        d_v = dp * others[ax] + gs[b1] * v[b2] + gs[b2] * v[b1]
        d_gd = dj_ref[ax] * ss[ax] * others[ax]
        du_ref[pl.ds(ax, 1), :] = jnp.sum(
            d_v * gd[ax], axis=0, keepdims=True
        ) * ss[ax]
        contrib = jax.lax.dot_general(
            d_v.astype(jnp.bfloat16), _tent(dl_ref.shape[2], ps[ax], bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            d_gd.astype(jnp.bfloat16), _diffhot(dl_ref.shape[2], ps[ax], bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, rpad)

        @pl.when(i == 0)
        def _():
            dl_ref[ax] = contrib

        @pl.when(i > 0)
        def _():
            dl_ref[ax] = dl_ref[ax] + contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def cp_product_jac(lx, ly, lz, u3, res):
    """(prod (C, N), jac (3, C, N)) with jac = d prod / d u3, as ONE
    custom-VJP Pallas op — the encoding half of the NeuS analytic-gradient
    contract (reference models/geometry.py:176-180 builds a second-order
    graph; here the Jacobian is a forward OUTPUT, so the loss backward
    only needs this op's (hand-written) VJP, never forward-over-reverse)."""
    prod, jac, _, _ = _cp_product_jac_fwd_impl(lx, ly, lz, u3, res)
    return prod, jac


def _cp_product_jac_fwd_impl(lx, ly, lz, u3, res):
    c = lx.shape[1]
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    lines = _lines_stack(lx, ly, lz)
    prod, jac, vsave, gdsave = pl.pallas_call(
        functools.partial(_jac_fwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((c, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, c, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, c, npad), jnp.bfloat16),
            jax.ShapeDtypeStruct((3, c, npad), jnp.bfloat16),
        ],
        interpret=_interpret_default(),
    )(lines, u3p)
    return prod[:, :n], jac[:, :, :n], vsave, gdsave


def _cp_product_jac_fwd(lx, ly, lz, u3, res):
    prod, jac, vsave, gdsave = _cp_product_jac_fwd_impl(lx, ly, lz, u3, res)
    return (prod, jac), (lx, ly, lz, u3, vsave, gdsave)


def _cp_product_jac_bwd(res, saved, cts):
    dprod, djac = cts
    lx, ly, lz, u3, vsave, gdsave = saved
    c = lx.shape[1]
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    dp = jnp.pad(dprod, ((0, 0), (0, npad - n)))
    dj = jnp.pad(djac, ((0, 0), (0, 0), (0, npad - n)))
    lines = _lines_stack(lx, ly, lz)
    dl, du = pl.pallas_call(
        functools.partial(_jac_bwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((c, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, c, _rpad(res)), jnp.float32),
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(lines, u3p, vsave, gdsave, dp, dj)

    return (
        dl[0, :, :res].T, dl[1, :, :res].T, dl[2, :, :res].T, du[:, :n]
    )


cp_product_jac.defvjp(_cp_product_jac_fwd, _cp_product_jac_bwd)


# ---------------------------------------------------------------------------
# product + Jacobian with the basis projection fused in (the NeuS
# analytic-gradient hot path when n_features > 0): outputs shrink from
# (C, N)/(3, C, N) to (F, N)/(3, F, N) — 4x less Jacobian HBM traffic at
# the flagship spec (C=64, F=16) in BOTH directions, and the projection
# matmuls run on operands already resident in VMEM.
# ---------------------------------------------------------------------------


def _jacb_fwd_kernel(res, c, lines_ref, bt_ref, u_ref,
                     enc_ref, jac_ref, v_ref, gd_ref):
    """Like _jac_fwd_kernel but projects prod/jac through B^T (F, C)."""
    bn = u_ref.shape[1]
    vs, gs = [], []
    for ax in range(3):
        u_ax, p = _axis_p(res, u_ref, ax)
        rows = lines_ref.shape[2]
        v = jax.lax.dot_general(
            lines_ref[ax], _tent(rows, p, bn), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gd = jax.lax.dot_general(
            lines_ref[ax], _diffhot(rows, p, bn), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v_ref[ax] = v.astype(jnp.bfloat16)
        gd_ref[ax] = gd.astype(jnp.bfloat16)
        vs.append(v)
        gs.append(gd * ((res - 1) * _inrange_half(u_ax)))

    def proj(x):
        return jax.lax.dot_general(
            bt_ref[...], x.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    enc_ref[...] = proj(vs[0] * vs[1] * vs[2])
    jac_ref[0] = proj(gs[0] * (vs[1] * vs[2]))
    jac_ref[1] = proj(gs[1] * (vs[0] * vs[2]))
    jac_ref[2] = proj(gs[2] * (vs[0] * vs[1]))


def _jacb_bwd_kernel(res, c, lines_ref, bt_ref, u_ref, v_ref, gd_ref,
                     de_ref, dj_ref, dl_ref, du_ref, dbt_ref):
    """Cotangents (d enc, d jac) -> (d lines, d u, d basis^T).

    Identical math to _jac_bwd_kernel after pulling the cotangents back
    through the projection (dP = B @ d_enc, dJ_ax = B @ d_jac_ax) and
    accumulating d B^T from the recomputed pre-projection products."""
    i = pl.program_id(0)
    bn = u_ref.shape[1]
    v = [v_ref[ax].astype(jnp.float32) for ax in range(3)]
    gd = [gd_ref[ax].astype(jnp.float32) for ax in range(3)]
    u_axs, ss = [], []
    for ax in range(3):
        u_ax, _ = _axis_p(res, u_ref, ax)
        u_axs.append(u_ax)
        ss.append((res - 1) * _inrange_half(u_ax))
    others = (v[1] * v[2], v[0] * v[2], v[0] * v[1])
    prod = v[0] * others[0]
    jpre = [gd[ax] * ss[ax] * others[ax] for ax in range(3)]  # (C, BN)

    def unproj(x):  # B @ x : (C, BN)
        return jax.lax.dot_general(
            bt_ref[...], x.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def outerT(a, b):  # a (F, BN) x b (C, BN) -> (F, C)
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    de = de_ref[...]  # (F, BN)
    dbt = outerT(de, prod)
    dp = unproj(de)  # (C, BN)
    djs = []
    for ax in range(3):
        dj_ax = dj_ref[ax]  # (F, BN)
        dbt = dbt + outerT(dj_ax, jpre[ax])
        djs.append(unproj(dj_ax))  # (C, BN)

    @pl.when(i == 0)
    def _():
        dbt_ref[...] = dbt

    @pl.when(i > 0)
    def _():
        dbt_ref[...] = dbt_ref[...] + dbt

    gs = [djs[ax] * gd[ax] * ss[ax] for ax in range(3)]
    for ax in range(3):
        b1, b2 = [b for b in range(3) if b != ax]
        d_v = dp * others[ax] + gs[b1] * v[b2] + gs[b2] * v[b1]
        d_gd = djs[ax] * ss[ax] * others[ax]
        du_ref[pl.ds(ax, 1), :] = jnp.sum(
            d_v * gd[ax], axis=0, keepdims=True
        ) * ss[ax]
        _, p = _axis_p(res, u_ref, ax)
        contrib = jax.lax.dot_general(
            d_v.astype(jnp.bfloat16), _tent(dl_ref.shape[2], p, bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            d_gd.astype(jnp.bfloat16), _diffhot(dl_ref.shape[2], p, bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            dl_ref[ax] = contrib

        @pl.when(i > 0)
        def _():
            dl_ref[ax] = dl_ref[ax] + contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def cp_product_jac_basis(lx, ly, lz, basis, u3, res):
    """(enc (F, N), jac (3, F, N)) with the (C, F) basis projection fused:
    enc = B^T (vx*vy*vz), jac = d enc / d u3. One custom-VJP Pallas op —
    same second-order contract as ``cp_product_jac`` (the Jacobian is a
    forward OUTPUT; the loss backward only needs this op's VJP)."""
    enc, jac, _, _ = _cp_jacb_fwd_impl(lx, ly, lz, basis, u3, res)
    return enc, jac


def _cp_jacb_fwd_impl(lx, ly, lz, basis, u3, res):
    c = lx.shape[1]
    f = basis.shape[1]
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    lines = _lines_stack(lx, ly, lz)
    bt = basis.T.astype(jnp.bfloat16)  # (F, C)
    enc, jac, vsave, gdsave = pl.pallas_call(
        functools.partial(_jacb_fwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((f, bn), lambda i: (0, i)),
            pl.BlockSpec((3, f, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, f, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, c, npad), jnp.bfloat16),
            jax.ShapeDtypeStruct((3, c, npad), jnp.bfloat16),
        ],
        interpret=_interpret_default(),
    )(lines, bt, u3p)
    return enc[:, :n], jac[:, :, :n], vsave, gdsave


def _cp_jacb_fwd(lx, ly, lz, basis, u3, res):
    enc, jac, vsave, gdsave = _cp_jacb_fwd_impl(lx, ly, lz, basis, u3, res)
    return (enc, jac), (lx, ly, lz, basis, u3, vsave, gdsave)


def _cp_jacb_bwd(res, saved, cts):
    denc, djac = cts
    lx, ly, lz, basis, u3, vsave, gdsave = saved
    c = lx.shape[1]
    f = basis.shape[1]
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    de = jnp.pad(denc, ((0, 0), (0, npad - n)))
    dj = jnp.pad(djac, ((0, 0), (0, 0), (0, npad - n)))
    lines = _lines_stack(lx, ly, lz)
    bt = basis.T.astype(jnp.bfloat16)
    dl, du, dbt = pl.pallas_call(
        functools.partial(_jacb_bwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((f, bn), lambda i: (0, i)),
            pl.BlockSpec((3, f, bn), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((3, c, _rpad(res)), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, c, _rpad(res)), jnp.float32),
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((f, c), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(lines, bt, u3p, vsave, gdsave, de, dj)
    return (
        dl[0, :, :res].T, dl[1, :, :res].T, dl[2, :, :res].T,
        dbt.T, du[:, :n],
    )


cp_product_jac_basis.defvjp(_cp_jacb_fwd, _cp_jacb_bwd)


# ---------------------------------------------------------------------------
# stacked-scales helpers (shared by cp_mlp_pallas and the jac op below)
# ---------------------------------------------------------------------------


def stackable(cp_spec) -> bool:
    rmax = max(cp_spec.resolutions)
    return all((rmax - 1) % (r - 1) == 0 for r in cp_spec.resolutions)


def _upsample_matrix(r_coarse: int, r_fine: int):
    """(r_fine, r_coarse) f32: exact p.l. interpolation of coarse knots at
    fine knot positions (nested grids => weights are exact k-ths)."""
    import numpy as np

    k = (r_fine - 1) // (r_coarse - 1)
    u = np.zeros((r_fine, r_coarse), np.float32)
    for i in range(r_fine):
        j, m = divmod(i, k)
        if m == 0:
            u[i, j] = 1.0
        else:
            u[i, j] = 1.0 - m / k
            u[i, j + 1] = m / k
    return jnp.asarray(u)


def _stack_lines_fine(cp_params, cp_spec, rpad):
    """(3, S*C, rpad) bf16: all scales' lines on the finest grid."""
    rmax = max(cp_spec.resolutions)
    per_ax = []
    for ax in range(3):
        rows = []
        for s, r in enumerate(cp_spec.resolutions):
            line = cp_params[f"line_{s}_{ax}"]  # (R_s, C)
            if r != rmax:
                line = _upsample_matrix(r, rmax) @ line
            rows.append(line.T)  # (C, rmax)
        per_ax.append(jnp.concatenate(rows, axis=0))  # (S*C, rmax)
    stack = jnp.stack(per_ax)  # (3, S*C, rmax)
    if rpad > rmax:
        stack = jnp.pad(stack, ((0, 0), (0, 0), (0, rpad - rmax)))
    return stack.astype(jnp.bfloat16)




# ---------------------------------------------------------------------------
# stacked-scales product + Jacobian with fused block-diagonal basis — the
# NeuS analytic path twin of cp_mlp_pallas.cp_mlp_apply_stacked: all
# scales on the finest grid, one full-width matmul pair (tent + diffhot)
# per axis, projection through the block-diagonal (E, S*C) basis.
# ---------------------------------------------------------------------------


def _jacs_fwd_kernel(rmax, c, lines_ref, bt_ref, u_ref,
                     enc_ref, jac_ref, v_ref, gd_ref):
    bn = u_ref.shape[1]
    rows = lines_ref.shape[2]
    vs, gs = [], []
    for ax in range(3):
        u_ax, p = _axis_p(rmax, u_ref, ax)
        v = jax.lax.dot_general(
            lines_ref[ax], _tent(rows, p, bn), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S*C, BN)
        gd = jax.lax.dot_general(
            lines_ref[ax], _diffhot(rows, p, bn), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v_ref[ax] = v.astype(jnp.bfloat16)
        gd_ref[ax] = gd.astype(jnp.bfloat16)
        vs.append(v)
        gs.append(gd * ((rmax - 1) * _inrange_half(u_ax)))

    def proj(x):
        return jax.lax.dot_general(
            bt_ref[...], x.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    enc_ref[...] = proj(vs[0] * vs[1] * vs[2])
    jac_ref[0] = proj(gs[0] * (vs[1] * vs[2]))
    jac_ref[1] = proj(gs[1] * (vs[0] * vs[2]))
    jac_ref[2] = proj(gs[2] * (vs[0] * vs[1]))


def _jacs_bwd_kernel(rmax, c, lines_ref, bt_ref, u_ref, v_ref, gd_ref,
                     de_ref, dj_ref, dl_ref, du_ref, dbt_ref):
    i = pl.program_id(0)
    bn = u_ref.shape[1]
    rows = dl_ref.shape[2]
    v = [v_ref[ax].astype(jnp.float32) for ax in range(3)]
    gd = [gd_ref[ax].astype(jnp.float32) for ax in range(3)]
    ss = []
    for ax in range(3):
        u_ax, _ = _axis_p(rmax, u_ref, ax)
        ss.append((rmax - 1) * _inrange_half(u_ax))
    others = (v[1] * v[2], v[0] * v[2], v[0] * v[1])
    prod = v[0] * others[0]
    jpre = [gd[ax] * ss[ax] * others[ax] for ax in range(3)]

    def unproj(x):
        return jax.lax.dot_general(
            bt_ref[...], x.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def outerT(a, b):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    de = de_ref[...]
    dbt = outerT(de, prod)
    dp = unproj(de)
    djs = []
    for ax in range(3):
        dj_ax = dj_ref[ax]
        dbt = dbt + outerT(dj_ax, jpre[ax])
        djs.append(unproj(dj_ax))

    @pl.when(i == 0)
    def _():
        dbt_ref[...] = dbt

    @pl.when(i > 0)
    def _():
        dbt_ref[...] = dbt_ref[...] + dbt

    gs = [djs[ax] * gd[ax] * ss[ax] for ax in range(3)]
    for ax in range(3):
        b1, b2 = [b for b in range(3) if b != ax]
        d_v = dp * others[ax] + gs[b1] * v[b2] + gs[b2] * v[b1]
        d_gd = djs[ax] * ss[ax] * others[ax]
        du_ref[pl.ds(ax, 1), :] = jnp.sum(
            d_v * gd[ax], axis=0, keepdims=True
        ) * ss[ax]
        _, p = _axis_p(rmax, u_ref, ax)
        contrib = jax.lax.dot_general(
            d_v.astype(jnp.bfloat16), _tent(rows, p, bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            d_gd.astype(jnp.bfloat16), _diffhot(rows, p, bn),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            dl_ref[ax] = contrib

        @pl.when(i > 0)
        def _():
            dl_ref[ax] = dl_ref[ax] + contrib


def _blockdiag_bt(params, spec):
    """(E, S*C) bf16 block-diagonal basis (scale s's B^T in rows/cols s)."""
    c, f = spec.n_components, spec.n_features
    e = spec.n_output_dims
    s_count = len(spec.resolutions)
    bt = jnp.zeros((e, s_count * c), jnp.float32)
    for s in range(s_count):
        bt = bt.at[s * f : (s + 1) * f, s * c : (s + 1) * c].set(
            params[f"basis_{s}"].T
        )
    return bt.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cp_jac_basis_stacked(params, u3, spec):
    """(enc (E, N), jac (3, E, N)) over ALL scales in one kernel pass —
    requires ``stackable(spec)`` and ``n_features > 0``. Same second-order
    contract as ``cp_product_jac_basis``."""
    enc, jac, _, _ = _cp_jacs_fwd_impl(params, u3, spec)
    return enc, jac


def _cp_jacs_fwd_impl(params, u3, spec):
    c = spec.n_components
    s_count = len(spec.resolutions)
    e = spec.n_output_dims
    rmax = max(spec.resolutions)
    rpad = _rpad(rmax)
    bn = _block_n(rmax)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    lines = _stack_lines_fine(params, spec, rpad)
    bt = _blockdiag_bt(params, spec)
    sc = s_count * c
    enc, jac, vsave, gdsave = pl.pallas_call(
        functools.partial(_jacs_fwd_kernel, rmax, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, sc, rpad), lambda i: (0, 0, 0)),
            pl.BlockSpec((e, sc), lambda i: (0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((e, bn), lambda i: (0, i)),
            pl.BlockSpec((3, e, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, sc, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, sc, bn), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, e, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, sc, npad), jnp.bfloat16),
            jax.ShapeDtypeStruct((3, sc, npad), jnp.bfloat16),
        ],
        interpret=_interpret_default(),
    )(lines, bt, u3p)
    return enc[:, :n], jac[:, :, :n], vsave, gdsave


def _cp_jacs_fwd(params, u3, spec):
    enc, jac, vsave, gdsave = _cp_jacs_fwd_impl(params, u3, spec)
    return (enc, jac), (params, u3, vsave, gdsave)


def _cp_jacs_bwd(spec, saved, cts):
    denc, djac = cts
    params, u3, vsave, gdsave = saved
    c = spec.n_components
    f = spec.n_features
    s_count = len(spec.resolutions)
    e = spec.n_output_dims
    rmax = max(spec.resolutions)
    rpad = _rpad(rmax)
    bn = _block_n(rmax)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    de = jnp.pad(denc, ((0, 0), (0, npad - n)))
    dj = jnp.pad(djac, ((0, 0), (0, 0), (0, npad - n)))
    lines = _stack_lines_fine(params, spec, rpad)
    bt = _blockdiag_bt(params, spec)
    sc = s_count * c
    dl, du, dbt = pl.pallas_call(
        functools.partial(_jacs_bwd_kernel, rmax, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, sc, rpad), lambda i: (0, 0, 0)),
            pl.BlockSpec((e, sc), lambda i: (0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((3, sc, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, sc, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((e, bn), lambda i: (0, i)),
            pl.BlockSpec((3, e, bn), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((3, sc, rpad), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((e, sc), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, sc, rpad), jnp.float32),
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((e, sc), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(lines, bt, u3p, vsave, gdsave, de, dj)

    d_params = {}
    for s, r in enumerate(spec.resolutions):
        for ax in range(3):
            dl_fine = dl[ax, s * c : (s + 1) * c, :rmax]  # (C, rmax)
            if r != rmax:
                d_params[f"line_{s}_{ax}"] = (
                    dl_fine @ _upsample_matrix(r, rmax)
                ).T
            else:
                d_params[f"line_{s}_{ax}"] = dl_fine.T
        d_params[f"basis_{s}"] = dbt[
            s * f : (s + 1) * f, s * c : (s + 1) * c
        ].T
    return d_params, du[:, :n]


cp_jac_basis_stacked.defvjp(_cp_jacs_fwd, _cp_jacs_bwd)
