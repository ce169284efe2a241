"""Pallas TPU kernel for the CP line-encoding product — hand-written
forward + backward.

Why this exists: the XLA formulation of the CP encode (ops/cp.py) is
HBM-bound, not MXU-bound — XLA materializes the (N, R) one-hot operands
in HBM (~1 GB each at the bench workload: N=262k, R=2048, bf16), so the
measured 5.6 ms forward is exactly the ~4.5 GB of one-hot traffic at
819 GB/s (PERF.md). This kernel generates each one-hot BLOCK on the VPU
directly in VMEM, feeds it to the MXU, and never spills it: the only HBM
traffic is the inputs, the (C, N) outputs, and two (3, C, N) residuals.
The backward accumulates the (2C, R) table gradient in a VMEM-resident
f32 block across the sample grid (the Pallas revisited-output pattern),
replacing XLA's equally HBM-bound one-hot cotangent matmuls.

Math (identical to ops/cp.py `_line_interp` + axis product):

    v_ax  = (1 - f) * L_ax[i0] + f * L_ax[i0 + 1]        (C, N)
    prod  = v_x * v_y * v_z                               (C, N)

with the two table rows fetched via ONE one-hot matmul against the
concatenated table ``cat = [L^T ; shift(L^T)]`` (2C, R), so
``g = cat @ onehot(i0)^T`` gives g0 = g[:C] and g1 = g[C:].

Gradients:
    d cat   += [ (1-f) * d_v ; f * d_v ] @ onehot(i0)    (2C, R)
    d L[r]   = d cat_top[r] + d cat_bottom[r - 1]
    d u_ax   = sum_C d_v * (g1 - g0) * (res - 1)         (inside [0,1])

Positions and tables are f32; one-hot entries are exact in bf16 and the
interpolation weights are applied in f32 after the matmul (same
precision contract as the XLA path). Gradient contributions round to
bf16 before the MXU accumulation (f32 accumulators), mirroring the XLA
path's bf16 one-hot cotangent dots.

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
from jax.experimental.pallas import tpu as pltpu


def _block_n(res: int) -> int:
    """Sample-block size: keep the (R, BN) bf16 one-hot + the (2C, R) f32
    gradient accumulator comfortably inside ~16 MB of VMEM."""
    if res <= 2048:
        return 1024
    if res <= 4096:
        return 256
    return 128


def _supported(res: int, c: int) -> bool:
    # tile-aligned table dims; anything else falls back to the XLA path
    return res % 8 == 0 and c % 8 == 0


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _axis_onehot(res, u_ref, ax, bn):
    """(1, BN) coords for axis `ax` -> i0/f + exact-bf16 (R, BN) one-hot."""
    u_ax = u_ref[pl.ds(ax, 1), :]  # (1, BN) f32
    p = jnp.clip(u_ax, 0.0, 1.0) * (res - 1)
    i0 = jnp.minimum(jnp.floor(p), res - 2).astype(jnp.int32)  # (1, BN)
    f = p - i0.astype(jnp.float32)  # (1, BN)
    ohT = (
        jax.lax.broadcasted_iota(jnp.int32, (res, bn), 0) == i0
    ).astype(jnp.bfloat16)  # (R, BN), exact in bf16
    return u_ax, f, ohT


def _fwd_kernel(res, c, lines_ref, u_ref, prod_ref, v_ref, gd_ref):
    # All 3 axes unrolled in one body: the (3, 2C, R) table stack stays
    # VMEM-resident across the whole sample grid (its index map is
    # constant) and each sample block makes exactly one pass — no
    # read-modify-write prod revisits, 3x fewer grid steps.
    bn = u_ref.shape[1]
    prod = None
    for ax in range(3):
        _, f, ohT = _axis_onehot(res, u_ref, ax, bn)
        cat = lines_ref[ax]  # (2C, R) bf16
        g = jax.lax.dot_general(
            cat, ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2C, BN)
        g0 = g[:c]
        gd = g[c:] - g0  # g1 - g0
        v = g0 + f * gd  # (C, BN) f32
        v_ref[ax] = v
        gd_ref[ax] = gd
        prod = v if prod is None else prod * v
    prod_ref[...] = prod


def _bwd_kernel(res, c, u_ref, v_ref, gd_ref, dp_ref, dcat_ref, du_ref):
    i = pl.program_id(0)
    bn = u_ref.shape[1]
    dp = dp_ref[...]  # (C, BN) f32
    v0, v1, v2 = v_ref[0], v_ref[1], v_ref[2]
    others = (v1 * v2, v0 * v2, v0 * v1)
    for ax in range(3):
        u_ax, f, ohT = _axis_onehot(res, u_ref, ax, bn)
        d_v = dp * others[ax]  # (C, BN) f32

        # d u: zero outside [0,1]; jnp.clip (the XLA path) splits the
        # gradient 50/50 at exact boundary ties — match that convention
        in_range = jnp.where(
            (u_ax < 0.0) | (u_ax > 1.0),
            0.0,
            jnp.where((u_ax == 0.0) | (u_ax == 1.0), 0.5, 1.0),
        )
        du_ref[pl.ds(ax, 1), :] = (
            jnp.sum(d_v * gd_ref[ax], axis=0, keepdims=True)
            * (res - 1)
            * in_range
        )

        # d cat, accumulated in a VMEM-resident f32 block across the
        # sample grid (revisited-output pattern)
        dg = jnp.concatenate([(1.0 - f) * d_v, f * d_v], axis=0)  # (2C, BN)
        contrib = jax.lax.dot_general(
            dg.astype(jnp.bfloat16), ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2C, R)

        @pl.when(i == 0)
        def _():
            dcat_ref[ax] = contrib

        @pl.when(i > 0)
        def _():
            dcat_ref[ax] = dcat_ref[ax] + contrib


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _interpret_default() -> bool:
    # tests run CPU-pinned; interpret mode executes the same kernel logic
    return jax.default_backend() not in ("tpu",)


def _lines_cat(lx, ly, lz):
    """(3, 2C, R) bf16: per axis [L^T ; L^T shifted left along R]."""
    cats = []
    for line in (lx, ly, lz):
        lt = line.T  # (C, R)
        shifted = jnp.concatenate([lt[:, 1:], jnp.zeros_like(lt[:, :1])], 1)
        cats.append(jnp.concatenate([lt, shifted], axis=0))  # (2C, R)
    return jnp.stack(cats).astype(jnp.bfloat16)


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
    prod, _, _ = _cp_product_fwd_impl(lx, ly, lz, u3, res)
    return prod


def _cp_product_fwd_impl(lx, ly, lz, u3, res):
    c = lx.shape[1]
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    cat = _lines_cat(lx, ly, lz)

    prod, vsave, gdiff = pl.pallas_call(
        functools.partial(_fwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, 2 * c, res), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((c, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, c, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, c, npad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(cat, u3p)
    return prod[:, :n], vsave, gdiff


def _cp_product_fwd(lx, ly, lz, u3, res):
    prod, vsave, gdiff = _cp_product_fwd_impl(lx, ly, lz, u3, res)
    return prod, (u3, vsave, gdiff, lx.shape[1])


def _cp_product_bwd(res, saved, dprod):
    u3, vsave, gdiff, c = saved
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    dp = jnp.pad(dprod, ((0, 0), (0, npad - n)))  # zero ct for padding

    dcat, du = pl.pallas_call(
        functools.partial(_bwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((c, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((3, 2 * c, res), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 2 * c, res), jnp.float32),
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(u3p, vsave, gdiff, dp)

    # d L[r] = d cat_top[r] + d cat_bottom[r - 1]; back to (R, C)
    def unshift(dc):
        top, bot = dc[:c], dc[c:]
        bot = jnp.concatenate([jnp.zeros_like(bot[:, :1]), bot[:, :-1]], 1)
        return (top + bot).T

    return (
        unshift(dcat[0]),
        unshift(dcat[1]),
        unshift(dcat[2]),
        du[:, :n],
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


def _inrange_half(u_ax):
    """d clip(u)/d u with the XLA path's 50/50 boundary-tie convention."""
    return jnp.where(
        (u_ax < 0.0) | (u_ax > 1.0),
        0.0,
        jnp.where((u_ax == 0.0) | (u_ax == 1.0), 0.5, 1.0),
    )


def _jac_fwd_kernel(res, c, lines_ref, u_ref, prod_ref, jac_ref, v_ref, gd_ref):
    """prod = v0*v1*v2 and jac_a = gd_a * (res-1) * inrange_a * prod_{b!=a} v_b
    in one pass; saves v and gd residuals for the backward."""
    bn = u_ref.shape[1]
    vs, gs = [], []
    for ax in range(3):
        u_ax, f, ohT = _axis_onehot(res, u_ref, ax, bn)
        cat = lines_ref[ax]
        g = jax.lax.dot_general(
            cat, ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g0 = g[:c]
        gd = g[c:] - g0
        v = g0 + f * gd
        v_ref[ax] = v
        gd_ref[ax] = gd
        vs.append(v)
        gs.append(gd * ((res - 1) * _inrange_half(u_ax)))
    prod_ref[...] = vs[0] * vs[1] * vs[2]
    jac_ref[0] = gs[0] * (vs[1] * vs[2])
    jac_ref[1] = gs[1] * (vs[0] * vs[2])
    jac_ref[2] = gs[2] * (vs[0] * vs[1])


def _jac_bwd_kernel(
    res, c, u_ref, v_ref, gd_ref, dp_ref, dj_ref, dcat_ref, du_ref
):
    """Cotangents (d prod, d jac) -> (d cat tables, d u).

    With s_a = (res-1)*inrange_a and other_a = prod_{b!=a} v_b:
      d v_a  = dp * other_a + sum_{c!=a} dj_c * gd_c * s_c * prod_{b!=a,c} v_b
      d gd_a (jac-only part) = dj_a * s_a * other_a
      d g0_a = d v_a * (1 - f_a) - d gd_a ;  d g1_a = d v_a * f_a + d gd_a
      d u_a  = sum_C (d v_a * gd_a) * s_a      (i0/inrange are p.c. => 0 a.e.)
    """
    i = pl.program_id(0)
    bn = u_ref.shape[1]
    dp = dp_ref[...]
    v = [v_ref[0], v_ref[1], v_ref[2]]
    gd = [gd_ref[0], gd_ref[1], gd_ref[2]]
    u_axs, fs, ohTs, ss = [], [], [], []
    for ax in range(3):
        u_ax, f, ohT = _axis_onehot(res, u_ref, ax, bn)
        u_axs.append(u_ax)
        fs.append(f)
        ohTs.append(ohT)
        ss.append((res - 1) * _inrange_half(u_ax))
    others = (v[1] * v[2], v[0] * v[2], v[0] * v[1])
    gs = [dj_ref[ax] * gd[ax] * ss[ax] for ax in range(3)]  # dj_c*gd_c*s_c
    for ax in range(3):
        b1, b2 = [b for b in range(3) if b != ax]
        d_v = dp * others[ax] + gs[b1] * v[b2] + gs[b2] * v[b1]
        d_gd = dj_ref[ax] * ss[ax] * others[ax]
        dg0 = d_v * (1.0 - fs[ax]) - d_gd
        dg1 = d_v * fs[ax] + d_gd
        du_ref[pl.ds(ax, 1), :] = jnp.sum(
            d_v * gd[ax], axis=0, keepdims=True
        ) * ss[ax]
        dg = jnp.concatenate([dg0, dg1], axis=0)  # (2C, BN)
        contrib = jax.lax.dot_general(
            dg.astype(jnp.bfloat16), ohTs[ax], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            dcat_ref[ax] = contrib

        @pl.when(i > 0)
        def _():
            dcat_ref[ax] = dcat_ref[ax] + contrib


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
    cat = _lines_cat(lx, ly, lz)
    prod, jac, vsave, gdiff = pl.pallas_call(
        functools.partial(_jac_fwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, 2 * c, res), lambda i: (0, 0, 0)),
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
            jax.ShapeDtypeStruct((3, c, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, c, npad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(cat, u3p)
    return prod[:, :n], jac[:, :, :n], vsave, gdiff


def _cp_product_jac_fwd(lx, ly, lz, u3, res):
    prod, jac, vsave, gdiff = _cp_product_jac_fwd_impl(lx, ly, lz, u3, res)
    return (prod, jac), (u3, vsave, gdiff, lx.shape[1])


def _cp_product_jac_bwd(res, saved, cts):
    dprod, djac = cts
    u3, vsave, gdiff, c = saved
    bn = _block_n(res)
    u3p, n = _pad_n(u3.astype(jnp.float32), bn, 0.5)
    npad = u3p.shape[1]
    nb = npad // bn
    dp = jnp.pad(dprod, ((0, 0), (0, npad - n)))
    dj = jnp.pad(djac, ((0, 0), (0, 0), (0, npad - n)))
    dcat, du = pl.pallas_call(
        functools.partial(_jac_bwd_kernel, res, c),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((c, bn), lambda i: (0, i)),
            pl.BlockSpec((3, c, bn), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((3, 2 * c, res), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 2 * c, res), jnp.float32),
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(u3p, vsave, gdiff, dp, dj)

    def unshift(dc):
        top, bot = dc[:c], dc[c:]
        bot = jnp.concatenate([jnp.zeros_like(bot[:, :1]), bot[:, :-1]], 1)
        return (top + bot).T

    return (unshift(dcat[0]), unshift(dcat[1]), unshift(dcat[2]), du[:, :n])


cp_product_jac.defvjp(_cp_product_jac_fwd, _cp_product_jac_bwd)
