"""Fused SH-encode -> concat -> MLP Pallas kernel (hand fwd + bwd) — the
radiance (color) half of the fused evaluation.

The radiance head (reference models/texture.py:10-36 via tcnn's
SphericalHarmonics + FullyFusedMLP, configs/nerf-blender.yaml:56-66) is
concat(features, SH(dirs)[, extras]) -> tiny bf16 ReLU MLP. Composed, the
SH basis, the concat, and every MLP activation round-trip HBM; here the
SH polynomials are evaluated on the VPU inside the kernel and the whole
chain stays in VMEM per sample block.

Differentiability contract: ``features`` (geometry features and any
extras such as NeuS surface normals) get real cotangents — they carry
parameter gradients. ``dirs`` are per-sample view directions, pure
functions of the rays (never of parameters), so their cotangent is
structurally unused and returned as zeros (the wrapper stop-gradients
them); the SH basis is therefore recomputed in the backward rather than
saved.

Input-row order: the composed path feeds the MLP
``[features | SH | extras]`` (models/texture.py). The kernel wants ONE
differentiable block, so the host packs the first layer's weight rows in
``[features | extras | SH]`` order (pack_mlp reorder_first_rows) and the
caller concatenates features+extras; gradients are un-reordered on the
way out. The packed diff block is zero-padded to a multiple of 8 rows
(zero weight rows make the padding exact).

Precision: bf16 matmul operands / f32 accumulators (tcnn fp16 parity),
SH computed in f32.

Reference role: the fused "color evaluation ... hand-written forward +
backward" kernel of the north star (BASELINE.md), paired with
ops/cp_mlp_pallas.py on the density side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from instant_nsr_pl_tpu.ops.cp_pallas import _pad_n
from instant_nsr_pl_tpu.ops.mlp_pallas_common import (
    kernel_mlp_bwd,
    kernel_mlp_fwd,
    make_acc,
    mlp_wmax,
    pack_mlp,
    unpack_mlp_grads,
)
from instant_nsr_pl_tpu.ops.sh import sh_output_dim

_BLOCK_N = 1024


def fusable(mlp_spec, n_feat: int, degree: int) -> bool:
    """Static check for the fused radiance path. ``n_feat`` counts ALL
    differentiable input rows (features + extras)."""
    return (
        1 <= degree <= 4
        and mlp_spec.dim_in == n_feat + sh_output_dim(degree)
        and mlp_spec.n_neurons % 8 == 0
        and mlp_spec.dim_out <= mlp_spec.n_neurons
        and mlp_spec.activation.lower() == "relu"
        and mlp_spec.precision == "bf16"
        and not mlp_spec.weight_norm
        and not mlp_spec.sphere_init
        and mlp_spec.n_hidden_layers >= 1
    )


def _kernel_sh(dirs, degree):
    """Real SH basis (S, BN) from unit dirs (3, BN), f32 — identical math
    to ops/sh.py (which rescales its [0,1] input back to [-1,1]; callers
    there pass (dirs+1)/2, so the basis is a function of raw dirs)."""
    from instant_nsr_pl_tpu.ops.sh import _C0, _C1, _C2, _C3

    x, y, z = dirs[0:1, :], dirs[1:2, :], dirs[2:3, :]
    rows = [jnp.full_like(x, _C0)]
    if degree > 1:
        rows += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        rows += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        rows += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.concatenate(rows, axis=0)


def _fwd_kernel(degree, n_hidden, fpad, *refs):
    ws_ref, bs_ref, feat_ref, dirs_ref, out_ref, h_ref = refs
    sh = _kernel_sh(dirs_ref[...], degree)
    x0 = jnp.concatenate([feat_ref[...], sh], axis=0)  # (fpad + S, BN)
    out_ref[...] = kernel_mlp_fwd(
        ws_ref, bs_ref, x0, n_hidden, h_ref, out_ref.shape[0]
    )


def _bwd_kernel(degree, n_hidden, fpad, *refs):
    ws_ref, feat_ref, dirs_ref, h_ref, dout_ref, dws_ref, dbs_ref, dfeat_ref = refs
    acc = make_acc(pl.program_id(0))
    sh = _kernel_sh(dirs_ref[...], degree)
    x0 = jnp.concatenate([feat_ref[...], sh], axis=0)
    d_x0 = kernel_mlp_bwd(
        ws_ref, h_ref, x0, dout_ref[...], n_hidden, acc, dws_ref, dbs_ref
    )
    dfeat_ref[...] = d_x0[:fpad, :]


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu",)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sh_mlp_apply(mlp_params, features, dirs, mlp_spec, degree, n_pre):
    """Fused radiance eval: (..., F) features + (..., 3) unit dirs -> (..., D).

    ``n_pre``: how many feature columns precede the SH block in the
    composed MLP input (the rest follow it — NeuS normals). Gradients
    flow to mlp_params and features; dirs get zero cotangents.
    """
    out, _, _ = _fwd_impl(mlp_params, features, dirs, mlp_spec, degree, n_pre)
    return out


def _perm(mlp_spec, degree, n_pre, n_feat):
    """Permutation p with w_packed = w[p]: kernel row order
    [pre-features, post-features(extras), SH].

    MUST stay a host-side numpy array: it rides through the custom-VJP
    into pack_mlp/unpack_mlp_grads, which invert it with np.argsort at
    trace time. A jnp array here becomes a tracer under jit/scan/
    shard_map and crashes the backward (round-2 VERDICT #1)."""
    import numpy as np

    s = sh_output_dim(degree)
    pre = list(range(n_pre))
    sh_rows = list(range(n_pre, n_pre + s))
    post = list(range(n_pre + s, mlp_spec.dim_in))
    return np.array(pre + post + sh_rows, dtype=np.int32)


def _fwd_impl(mlp_params, features, dirs, mlp_spec, degree, n_pre):
    batch_shape = features.shape[:-1]
    n_feat = features.shape[-1]
    s = sh_output_dim(degree)
    assert n_feat + s == mlp_spec.dim_in
    fpad = -(-n_feat // 8) * 8
    wmax = mlp_wmax(mlp_spec)
    n_hidden = mlp_spec.n_hidden_layers
    d_out = mlp_spec.dim_out
    bn = _BLOCK_N

    featT = features.reshape(-1, n_feat).astype(jnp.float32).T  # (F, N)
    if fpad > n_feat:
        featT = jnp.pad(featT, ((0, fpad - n_feat), (0, 0)))
    dirsT = jax.lax.stop_gradient(dirs).reshape(-1, 3).astype(jnp.float32).T

    featp, n = _pad_n(featT, bn, 0.0)
    dirsp, _ = _pad_n(dirsT, bn, 0.0)
    npad = featp.shape[1]
    nb = npad // bn

    perm = _perm(mlp_spec, degree, n_pre, n_feat)
    # pad the first layer's feature rows to fpad with zero rows: insert
    # zeros between the true feature rows and the SH rows
    ws, bs = pack_mlp(mlp_params, wmax, reorder_first_rows=perm)
    if fpad > n_feat:
        zrows = jnp.zeros((fpad - n_feat, wmax), ws.dtype)
        ws = jnp.concatenate([ws[:n_feat], zrows, ws[n_feat:]], axis=0)
    n_wrows = ws.shape[0]
    n_layers = n_hidden + 1

    out, hsave = pl.pallas_call(
        functools.partial(_fwd_kernel, degree, n_hidden, fpad),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
            pl.BlockSpec((n_layers, wmax), lambda i: (0, 0)),
            pl.BlockSpec((fpad, bn), lambda i: (0, i)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((d_out, bn), lambda i: (0, i)),
            pl.BlockSpec((max(n_hidden, 1), mlp_spec.n_neurons, bn), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_out, npad), jnp.float32),
            jax.ShapeDtypeStruct(
                (max(n_hidden, 1), mlp_spec.n_neurons, npad), jnp.bfloat16
            ),
        ],
        interpret=_interpret_default(),
    )(ws, bs, featp, dirsp)
    out = out[:, :n].T.reshape(*batch_shape, d_out)
    return out, (featp, dirsp, n, hsave), None


def _sh_mlp_fwd(mlp_params, features, dirs, mlp_spec, degree, n_pre):
    out, (featp, dirsp, n, hsave), _ = _fwd_impl(
        mlp_params, features, dirs, mlp_spec, degree, n_pre
    )
    return out, (mlp_params, featp, dirsp, hsave, features, dirs)


def _sh_mlp_bwd(mlp_spec, degree, n_pre, saved, dout):
    mlp_params, featp, dirsp, hsave, features, dirs = saved
    batch_shape = features.shape[:-1]
    n_feat = features.shape[-1]
    fpad = featp.shape[0]
    wmax = mlp_wmax(mlp_spec)
    n_hidden = mlp_spec.n_hidden_layers
    d_out = mlp_spec.dim_out
    bn = _BLOCK_N
    npad = featp.shape[1]
    nb = npad // bn
    n = dout.reshape(-1, d_out).shape[0]

    dp = jnp.pad(
        dout.reshape(-1, d_out).astype(jnp.float32).T, ((0, 0), (0, npad - n))
    )

    perm = _perm(mlp_spec, degree, n_pre, n_feat)
    ws, _ = pack_mlp(mlp_params, wmax, reorder_first_rows=perm)
    if fpad > n_feat:
        zrows = jnp.zeros((fpad - n_feat, wmax), ws.dtype)
        ws = jnp.concatenate([ws[:n_feat], zrows, ws[n_feat:]], axis=0)
    n_wrows = ws.shape[0]
    n_layers = n_hidden + 1

    dws, dbs, dfeat = pl.pallas_call(
        functools.partial(_bwd_kernel, degree, n_hidden, fpad),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
            pl.BlockSpec((fpad, bn), lambda i: (0, i)),
            pl.BlockSpec((3, bn), lambda i: (0, i)),
            pl.BlockSpec((max(n_hidden, 1), mlp_spec.n_neurons, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((d_out, bn), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((n_wrows, wmax), lambda i: (0, 0)),
            pl.BlockSpec((n_layers, wmax), lambda i: (0, 0)),
            pl.BlockSpec((fpad, bn), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_wrows, wmax), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, wmax), jnp.float32),
            jax.ShapeDtypeStruct((fpad, npad), jnp.float32),
        ],
        interpret=_interpret_default(),
    )(ws, featp, dirsp, hsave, dp)

    # un-pad the packed first-layer rows before unpacking layer grads
    if fpad > n_feat:
        dws = jnp.concatenate([dws[:n_feat], dws[fpad:]], axis=0)
    d_mlp = unpack_mlp_grads(dws, dbs, mlp_params, reorder_first_rows=perm)
    d_features = (
        dfeat[:n_feat, :n].T.reshape(*batch_shape, n_feat).astype(features.dtype)
    )
    return d_mlp, d_features, jnp.zeros_like(dirs)


sh_mlp_apply.defvjp(_sh_mlp_fwd, _sh_mlp_bwd)


def sh_mlp_reference(mlp_params, features, dirs, mlp_spec, degree, n_pre):
    """Plain-XLA twin (same math/precision) for parity tests: composed
    SH encode + concat in the composed row order + ops/mlp.py chain."""
    from instant_nsr_pl_tpu.ops.mlp import mlp_apply
    from instant_nsr_pl_tpu.ops.sh import spherical_harmonics_encoding

    d01 = (dirs + 1.0) / 2.0
    sh = spherical_harmonics_encoding(d01, degree)
    pre = features[..., :n_pre]
    post = features[..., n_pre:]
    inp = jnp.concatenate([pre, sh, post], axis=-1).astype(jnp.float32)
    return mlp_apply(mlp_params, inp, mlp_spec)
