"""Multiresolution hash-grid encoding (Instant-NGP).

TPU-native replacement for tiny-cuda-nn's ``HashGrid`` encoding (consumed by
the reference at models/network_utils.py:47,90 with configs like
configs/nerf-blender.yaml:44-49). Semantics follow the Instant-NGP paper and
tcnn's level layout:

- level ``l`` scale ``s_l = 2^(l*log2(b)) * N_min - 1``; resolution
  ``R_l = ceil(s_l) + 1``
- a level stores its grid densely when ``R_l^3 <= 2^log2_hashmap_size``
  (stride indexing), otherwise uses the spatial hash
  ``(x) ^ (y*2654435761) ^ (z*805459861) mod T`` with uint32 arithmetic
- trilinear interpolation over the 8 cell corners of ``pos = x*s_l + 0.5``

Two differentiation paths share the level layout:

- ``hashgrid_encode``: pure autodiff (scatter-add backward), differentiable
  at arbitrary order — required when the eikonal loss backprops through
  analytic SDF gradients (reference: models/geometry.py:176-180);
- ``hashgrid_encode_fast``: custom VJP whose hand-written table gradient
  runs as one-hot matmuls on the MXU (XLA lowers TPU scatter to a serial
  loop; see PERF.md for measurements) — the training hot path.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)

# 8 cube-corner offsets, shape (8, 3)
_CORNERS = np.array(
    [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.int32
)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static description of a hash-grid encoding (hashable; safe to close
    over in jitted functions)."""

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.447269237440378
    n_input_dims: int = 3
    # -- per-group tap dedup (off by default; see dedup_group_sizes) --------
    # ``dedup_group``: aligned block size of the input positions (the
    # group-compacted march guarantees every k-block is one ray's uniform
    # sub-segment). ``dedup_step``: per-sample position step in the
    # encoding's [0,1] input coords (an upper bound per axis, jitter
    # included). Both 0 = per-sample taps everywhere (exact legacy path).
    dedup_group: int = 0
    dedup_step: float = 0.0

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def scales(self) -> tuple[float, ...]:
        return tuple(
            math.exp2(l * math.log2(self.per_level_scale))
            * self.base_resolution
            - 1.0
            for l in range(self.n_levels)
        )

    @property
    def resolutions(self) -> tuple[int, ...]:
        return tuple(int(math.ceil(s)) + 1 for s in self.scales)

    @property
    def level_sizes(self) -> tuple[int, ...]:
        sizes = []
        for r in self.resolutions:
            dense = r**self.n_input_dims
            # tcnn rounds dense levels up to a multiple of 8
            dense = -(-dense // 8) * 8
            sizes.append(min(dense, self.table_size))
        return tuple(sizes)

    @property
    def level_hashed(self) -> tuple[bool, ...]:
        return tuple(
            r**self.n_input_dims > self.table_size for r in self.resolutions
        )

    @property
    def level_offsets(self) -> tuple[int, ...]:
        offs, acc = [], 0
        for s in self.level_sizes:
            offs.append(acc)
            acc += s
        return tuple(offs)

    @property
    def total_params(self) -> int:
        return sum(self.level_sizes)

    @property
    def dedup_group_sizes(self) -> tuple[int, ...]:
        """Per-level dedup block size (0 = per-sample 8-corner taps).

        Within an aligned block of ``g`` consecutive samples the per-axis
        position span is < ``g * dedup_step``; when that span fits inside
        ONE cell of level ``l`` (``g * dedup_step * scale_l <= 1``) every
        sample's cell lies in the block's anchor 2x2x2 cell cube, so the
        27-point corner lattice of that cube covers all 8*g corner taps —
        27 gathered rows per block instead of 8 per sample. Only block
        sizes >= 4 win (27/g < 8). XLA's TPU gather is ~5.4 ns/row however
        narrow (PERF.md gather micro-study), so fewer rows is the only
        lever this chip offers; this trades VPU tent-weight arithmetic for
        gather rows. Reference role: tcnn HashGrid forward taps
        (models/network_utils.py:90)."""
        if self.dedup_group < 4 or self.dedup_step <= 0.0:
            return tuple(0 for _ in range(self.n_levels))
        out = []
        for s in self.scales:
            # A halved g is only usable if it DIVIDES dedup_group: the march
            # guarantees single-ray uniform-step runs per dedup_group block,
            # and non-dividing g-blocks would straddle two such runs (mixing
            # rays / non-uniform spans, breaking the lattice-cover premise).
            g = self.dedup_group
            while g >= 4 and (
                g * self.dedup_step * s > 1.0 or self.dedup_group % g
            ):
                g //= 2
            out.append(g if g >= 4 else 0)
        return tuple(out)

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    @classmethod
    def from_config(cls, config, n_input_dims=3) -> "HashGridSpec":
        return cls(
            n_levels=int(config["n_levels"]),
            n_features_per_level=int(config["n_features_per_level"]),
            log2_hashmap_size=int(config["log2_hashmap_size"]),
            base_resolution=int(config["base_resolution"]),
            per_level_scale=float(config["per_level_scale"]),
            n_input_dims=n_input_dims,
        )


def hashgrid_init(rng, spec: HashGridSpec, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4) init, matching tcnn's hash-table default.

    Layout is feature-major ``(F, total_params)``: XLA TPU pads the two
    minor dims to an (8, 128) tile, so the row-major ``(12.6M, 2)`` table
    would physically occupy 64x its size — every optimizer pass over it
    moved ~6.4 GB (measured: ~340 ms/step of AdamW before this change).
    """
    return jax.random.uniform(
        rng,
        (spec.n_features_per_level, spec.total_params),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _level_corner_indices(spec: HashGridSpec, xt, level: int):
    """Gather indices + trilinear weights for one level.

    TPU layout note: every array here keeps the LARGE axis (N) last — shapes
    like (N, 8) or (N, L, 8, 3) would be padded by XLA's (8, 128) tile to
    up to 42x their size (observed: a 51 GB allocation for the all-levels
    u32[N,16,8,3] corner tensor on a 128^3 occupancy warmup).

    Args:
      xt: (3, N) positions in [0, 1], coordinate-major.
    Returns:
      idx: (8, N) int32 global rows; w: (8, N) float32 weights.
    """
    s = spec.scales[level]
    res = np.uint32(spec.resolutions[level])
    size = np.uint32(spec.level_sizes[level])
    offset = np.int32(spec.level_offsets[level])
    hashed = spec.level_hashed[level]

    pos = xt.astype(jnp.float32) * jnp.float32(s) + 0.5  # (3, N)
    grid = jnp.floor(pos)
    frac = pos - grid
    gi = grid.astype(jnp.int32)  # (3, N)

    idx_list, w_list = [], []
    rmax = jnp.int32(int(res) - 1)
    for c in range(8):
        bits = ((c & 1), ((c >> 1) & 1), ((c >> 2) & 1))
        cu = [
            jnp.clip(gi[d] + bits[d], 0, rmax).astype(jnp.uint32)
            for d in range(3)
        ]
        if hashed:
            local = (
                cu[0] * jnp.uint32(_PRIMES[0])
                ^ cu[1] * jnp.uint32(_PRIMES[1])
                ^ cu[2] * jnp.uint32(_PRIMES[2])
            ) % size
        else:
            local = cu[0] + cu[1] * res + cu[2] * res * res
        idx_list.append(local.astype(jnp.int32) + offset)
        w = jnp.float32(1.0)
        for d in range(3):
            w = w * (frac[d] if bits[d] else (1.0 - frac[d]))
        w_list.append(w)
    return jnp.stack(idx_list), jnp.stack(w_list)  # (8, N) each


# 27 lattice offsets of the 2x2x2 cell cube, shape (27, 3)
_LATTICE27 = np.array(
    [[i % 3, (i // 3) % 3, i // 9] for i in range(27)], dtype=np.int32
)


def _level_lattice_gather(params, xt, spec: HashGridSpec, level: int, g: int):
    """Per-block 27-point lattice gather for one dedup level.

    Args:
      xt: (3, N) positions in [0, 1], N divisible by g.
    Returns:
      idx: (27, B) int32 global rows (B = N // g), clamped like the
        per-sample path (weights stay attached to the UNCLAMPED lattice
        position, so colliding clamped rows sum exactly like the
        per-sample clamped corners do);
      gvals: (F, 27, B) gathered table rows;
      pos: (3, N) grid-space positions; anchors a = floor(min pos) per block.
    """
    s = spec.scales[level]
    res = np.uint32(spec.resolutions[level])
    size = np.uint32(spec.level_sizes[level])
    offset = np.int32(spec.level_offsets[level])
    hashed = spec.level_hashed[level]

    n = xt.shape[1]
    assert n % g == 0, (n, g)
    b = n // g
    pos = xt.astype(jnp.float32) * jnp.float32(s) + 0.5  # (3, N)
    a = jnp.floor(pos.reshape(3, b, g).min(axis=2)).astype(jnp.int32)  # (3, B)

    rmax = jnp.int32(int(res) - 1)
    offs = jnp.asarray(_LATTICE27)  # (27, 3)
    cu = [
        jnp.clip(a[d][None, :] + offs[:, d][:, None], 0, rmax).astype(
            jnp.uint32
        )
        for d in range(3)
    ]  # each (27, B)
    if hashed:
        local = (
            cu[0] * jnp.uint32(_PRIMES[0])
            ^ cu[1] * jnp.uint32(_PRIMES[1])
            ^ cu[2] * jnp.uint32(_PRIMES[2])
        ) % size
    else:
        local = cu[0] + cu[1] * res + cu[2] * res * res
    idx = local.astype(jnp.int32) + offset  # (27, B)
    gvals = jnp.take(params, idx.reshape(-1), axis=1).reshape(
        params.shape[0], 27, b
    )
    return idx, gvals, pos, a


def _lattice_axis_tents(pos, a, g):
    """Per-axis tent weights of every sample against its block lattice.

    Trilinear interpolation from the full lattice is the tent-product form
    feat = sum_j prod_d max(0, 1 - |pos_d - j_d|) * T[j]: the product is
    nonzero exactly at the 8 corners of the sample's cell, so summing over
    all 27 lattice points reproduces the per-sample 8-corner result.

    Returns (w3, t): w3 (3, 3, N) = tent(t_d - o) for o in {0,1,2};
    t (3, N) = pos - anchor.
    """
    t = pos - jnp.repeat(a, g, axis=1).astype(jnp.float32)  # (3, N)
    offs3 = jnp.arange(3, dtype=jnp.float32)[None, :, None]  # (1, 3, 1)
    w3 = jnp.maximum(0.0, 1.0 - jnp.abs(t[:, None, :] - offs3))  # (3, 3, N)
    return w3, t


def _lattice_w27(w3):
    off = _LATTICE27
    return w3[0, off[:, 0]] * w3[1, off[:, 1]] * w3[2, off[:, 2]]  # (27, N)


def _lattice_axis_dtents(t):
    """d tent(t_d - o) / d pos_d: (3, 3, N) — RIGHT-continuous piecewise
    constant (+1 on [-1, 0), -1 on [0, 1), 0 outside), matching the
    per-sample jac path (_jac_weights): that path evaluates the in-cell
    constant derivative of the floor(pos) cell, so at exactly-integer grid
    positions (frac == 0) it yields the right difference T[i+1] - T[i];
    the half-open support reproduces it (u==0 starts the descending tent,
    u==-1 the ascending one)."""
    offs3 = jnp.arange(3, dtype=jnp.float32)[None, :, None]
    u = t[:, None, :] - offs3  # (3, 3, N)
    return jnp.where(
        (u >= -1.0) & (u < 0.0),
        1.0,
        jnp.where((u >= 0.0) & (u < 1.0), -1.0, 0.0),
    )


_LATTICE_OTHERS = ((1, 2), (0, 2), (0, 1))


def _lattice_wd27(w3, dw3, d):
    """Per-lattice-point d(tent product)/d pos_d: (27, N), grid units."""
    off = _LATTICE27
    e1, e2 = _LATTICE_OTHERS[d]
    return dw3[d, off[:, d]] * w3[e1, off[:, e1]] * w3[e2, off[:, e2]]


def _level_lattice_feat(params, xt, spec, level, g):
    """Forward features of one dedup level: (F, N) + residuals."""
    idx, gvals, pos, a = _level_lattice_gather(params, xt, spec, level, g)
    w3, _ = _lattice_axis_tents(pos, a, g)
    w27 = _lattice_w27(w3)  # (27, N)
    grep = jnp.repeat(gvals, g, axis=2)  # (F, 27, N) — broadcast per block
    feat = (grep * w27[None].astype(params.dtype)).sum(axis=1)  # (F, N)
    return feat, (idx, gvals, a)


def _level_lattice_bwd(spec, xt, level, g, idx, gvals, a, ct_l):
    """Backward of one dedup level from saved lattice residuals.

    Args:
      ct_l: (N, F) float32 cotangent of this level's features.
    Returns:
      local_idx: (27*B,) int32 level-local rows; wg: (27*B, F) updates;
      dx_t: (3, N) position cotangent contribution (in x units).
    """
    s = jnp.float32(spec.scales[level])
    n = xt.shape[1]
    b = n // g
    f = ct_l.shape[1]
    pos = xt.astype(jnp.float32) * s + 0.5
    w3, t = _lattice_axis_tents(pos, a, g)
    w27 = _lattice_w27(w3)  # (27, N)

    # table gradient: per (lattice point, block) update = sum over the
    # block's samples of tent weight * cotangent
    wg = jnp.einsum(
        "obg,bgf->obf", w27.reshape(27, b, g), ct_l.reshape(b, g, f)
    ).reshape(27 * b, f)
    local_idx = (idx - np.int32(spec.level_offsets[level])).reshape(27 * b)

    # position cotangent: dL/dpos_d = sum_j (g_j . ct) * dtent_d * prod tents
    tg = jnp.einsum(
        "fob,bgf->obg", gvals.astype(jnp.float32), ct_l.reshape(b, g, f)
    ).reshape(27, n)
    dw3 = _lattice_axis_dtents(t)  # (3, 3, N)
    dx_parts = []
    for d in range(3):
        wd = _lattice_wd27(w3, dw3, d)  # (27, N)
        dx_parts.append((tg * wd).sum(axis=0))
    dx_t = jnp.stack(dx_parts) * s  # (3, N)
    return local_idx, wg, dx_t


def _level_lattice_feat_jac(params, xt, spec, level, g):
    """Forward features AND analytic position Jacobian of one dedup level
    from the 27-point lattice gather: feat (F, N), jac (3, F, N) in world
    units, plus the lattice residuals (idx, gvals, a)."""
    idx, gvals, pos, a = _level_lattice_gather(params, xt, spec, level, g)
    w3, t = _lattice_axis_tents(pos, a, g)
    dw3 = _lattice_axis_dtents(t)
    w27 = _lattice_w27(w3)  # (27, N)
    s = jnp.float32(spec.scales[level])
    grep = jnp.repeat(gvals, g, axis=2)  # (F, 27, N) virtual broadcast
    feat = (grep * w27[None].astype(params.dtype)).sum(axis=1)  # (F, N)
    gf32 = grep.astype(jnp.float32)
    jac_l = jnp.stack(
        [
            (gf32 * _lattice_wd27(w3, dw3, d)[None]).sum(axis=1)
            for d in range(3)
        ]
    ) * s  # (3, F, N)
    return feat, jac_l, (idx, gvals, a)


def _level_lattice_jac_bwd(spec, xt, level, g, idx, gvals, a, ct_f, ct_j):
    """Second-order backward of one dedup level: cotangents of (feat, jac)
    -> (level-local update rows, update values, position cotangent).

    Args:
      ct_f: (N, F) float32 feature cotangent.
      ct_j: (3, N, F) float32 Jacobian cotangent.
    Returns:
      local_idx (27*B,), wg (27*B, F), dx_t (3, N).
    """
    s = jnp.float32(spec.scales[level])
    n = xt.shape[1]
    b = n // g
    f = ct_f.shape[1]
    pos = xt.astype(jnp.float32) * s + 0.5
    w3, t = _lattice_axis_tents(pos, a, g)
    dw3 = _lattice_axis_dtents(t)
    w27 = _lattice_w27(w3)  # (27, N)
    wd27 = [_lattice_wd27(w3, dw3, d) for d in range(3)]  # 3 x (27, N)

    # table updates: u_o = w27_o ct_f + s * sum_d wd27_{d,o} ct_jac_d
    wg = jnp.einsum(
        "obg,bgf->obf", w27.reshape(27, b, g), ct_f.reshape(b, g, f)
    )
    for d in range(3):
        wg = wg + s * jnp.einsum(
            "obg,bgf->obf",
            wd27[d].reshape(27, b, g),
            ct_j[d].reshape(b, g, f),
        )
    wg = wg.reshape(27 * b, f)
    local_idx = (idx - np.int32(spec.level_offsets[level])).reshape(27 * b)

    gf = gvals.astype(jnp.float32)
    # dx term 1: feature cotangent through d(tent product)/dx
    tg_f = jnp.einsum("fob,bgf->obg", gf, ct_f.reshape(b, g, f)).reshape(
        27, n
    )
    dx_parts = [s * (tg_f * wd27[d]).sum(axis=0) for d in range(3)]

    # dx term 2: jac cotangent through the mixed second derivatives
    # d2(prod)/dx_e dx_d (e != d) = dtent_e dtent_d tent_third; diagonal 0
    off = _LATTICE27
    tg_j = [
        jnp.einsum("fob,bgf->obg", gf, ct_j[e].reshape(b, g, f)).reshape(
            27, n
        )
        for e in range(3)
    ]
    third = np.array([[0, 2, 1], [2, 0, 0], [1, 0, 0]], dtype=np.int32)
    for d in range(3):
        acc = 0.0
        for e in range(3):
            if e == d:
                continue
            gd = int(third[d][e])
            d2 = (
                dw3[e, off[:, e]]
                * dw3[d, off[:, d]]
                * w3[gd, off[:, gd]]
            )  # (27, N)
            acc = acc + (d2 * tg_j[e]).sum(axis=0)
        dx_parts[d] = dx_parts[d] + (s * s) * acc
    dx_t = jnp.stack(dx_parts)  # (3, N)
    return local_idx, wg, dx_t


def hashgrid_encode(params, x, spec: HashGridSpec, level_mask=None):
    """Encode positions with the multiresolution hash grid.

    This is the fully-autodiff path: differentiable at arbitrary order (the
    NeuS analytic-gradient eikonal loss needs second-order, reference
    models/geometry.py:176-180). Its table gradient is an XLA scatter-add —
    correct but slow on TPU (~58 ns/update, serial loop); the training hot
    path uses :func:`hashgrid_encode_fast` instead.

    Args:
      params: (F, total_params) table (feature-major; see hashgrid_init).
      x: (..., 3) positions in [0, 1].
      spec: static grid description.
      level_mask: optional (L,) float mask multiplied per level (progressive
        level unmasking, reference: models/network_utils.py:40-65).
    Returns:
      (..., L*F) features, same float dtype as params.
    """
    batch_shape = x.shape[:-1]
    xt = x.reshape(-1, spec.n_input_dims).T  # (3, N) coordinate-major
    params_t = params  # (F, T) feature-major storage

    outs = []
    for level in range(spec.n_levels):
        idx, w = _level_corner_indices(spec, xt, level)  # (8, N)
        g = jnp.take(params_t, idx, axis=1)  # (F, 8, N)
        feat = (g * w[None].astype(params.dtype)).sum(axis=1)  # (F, N)
        if level_mask is not None:
            feat = feat * level_mask[level].astype(feat.dtype)
        outs.append(feat)
    out = jnp.concatenate(outs, axis=0)  # (L*F, N) grouped by level
    return out.T.reshape(*batch_shape, spec.n_output_dims)


# ---------------------------------------------------------------------------
# Fast path: custom VJP with an MXU (one-hot matmul) table gradient
# ---------------------------------------------------------------------------
#
# The autodiff backward is a scatter-add of L*8*N updates, which XLA lowers
# to a serial loop on TPU (~58 ns/update — measured 1.2 s/step at the
# reference workload). Reformulated as one-hot matmuls the gradient runs on
# the MXU: for each level, grad = U^T @ (W * g) with U/W one-hot in a
# (A, B) = (T/B, B) radix decomposition of the table rows — measured ~2.2x
# faster overall, and cost scales with the level's table size so the coarse
# levels become nearly free. bf16 operands / fp32 accumulation.
#
# This path is first-order only (custom_vjp); the NeuS analytic-gradient
# geometry keeps using `hashgrid_encode`.

_MM_LANES = 512  # B in the (A, B) radix split; 4*128 lanes

# Above this table size the sort-based segment sum beats the one-hot
# matmul: matmul cost grows as 2*M*T*F dense FLOPs (~65 us per 1024 rows
# of T at the reference M), the two-sort cost as ~4 ns * (M + T). Measured
# crossover ~1<<17 at M = 2.1M taps (PERF.md round 2).
_SORT_GRAD_MIN_SIZE = 1 << 17


def _level_table_grad_sort(idx, wg, table_size):
    """One level's dense table gradient via the two-sort segment sum
    (ops/segment.py) — used for the big hashed levels where the one-hot
    matmul's dense-FLOP inflation dominates the step (measured ~33 ms per
    2^19-row level vs ~11 ms sorted)."""
    from instant_nsr_pl_tpu.ops.segment import segment_sum_dense_sorted

    return segment_sum_dense_sorted(idx, wg, table_size, feature_major=True)


def _level_table_grad_matmul(idx, wg, table_size):
    """One level's dense table gradient via one-hot matmuls.

    Args:
      idx: (M,) int32 local row ids in [0, table_size).
      wg: (M, F) float32 update values (interp weight * output cotangent).
      table_size: static level size T_l.
    Returns:
      (F, T_l) float32 gradient (feature-major, matching the table layout).
    """
    m = idx.shape[0]
    f = wg.shape[1]
    bdim = min(_MM_LANES, table_size)
    adim = -(-table_size // bdim)
    a = (idx // bdim).astype(jnp.int32)
    b = (idx % bdim).astype(jnp.int32)

    # chunk M to bound the one-hot materialization (U chunk: 64Kx A bf16)
    chunk = 65536
    pad = (-m) % chunk
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), adim, jnp.int32)])
        b = jnp.concatenate([b, jnp.zeros((pad,), jnp.int32)])
        wg = jnp.concatenate([wg, jnp.zeros((pad, f), wg.dtype)])
    n_chunks = (m + pad) // chunk
    a = a.reshape(n_chunks, chunk)
    b = b.reshape(n_chunks, chunk)
    wg = wg.reshape(n_chunks, chunk, f)

    iota_a = jnp.arange(adim, dtype=jnp.int32)
    iota_b = jnp.arange(bdim, dtype=jnp.int32)

    def body(c, acc):
        u = (a[c][:, None] == iota_a[None, :]).astype(jnp.bfloat16)  # (ch, A)
        wb = (b[c][:, None] == iota_b[None, :]).astype(jnp.bfloat16)  # (ch, B)
        wv = jnp.concatenate(
            [wb * wg[c][:, j : j + 1].astype(jnp.bfloat16) for j in range(f)],
            axis=1,
        )  # (ch, B*F)
        return acc + jnp.dot(u.T, wv, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((adim, bdim * f), jnp.float32)
    )
    # wv columns are [F blocks of B]: (A, F, B) -> feature-major (F, A*B)
    acc = acc.reshape(adim, f, bdim).transpose(1, 0, 2).reshape(f, adim * bdim)
    return acc[:, :table_size]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode_fast(params, x, spec: HashGridSpec, level_mask=None):
    """First-order hash encoding with the MXU table gradient (training hot
    path; the tiny-cuda-nn backward's atomic scatter-add role)."""
    # share the dedup-aware forward; unused tap residuals are DCE'd
    out, _ = _encode_with_taps(params, x, spec, level_mask)
    return out


def _encode_with_taps(params, x, spec: HashGridSpec, level_mask=None):
    """Forward encode that also returns per-level tap data as residuals:
    idx_all (L', 8, N) i32, w_all (L', 8, N) f32, g_all (L', F, 8, N) table
    values over the per-sample levels (saving these lets the backward skip
    re-hashing AND re-gathering all 8*N taps — the re-gather alone cost
    ~140 ms/step, PERF.md), plus per-dedup-level lattice residuals
    (idx (27, B), gvals (F, 27, B), anchors (3, B)) for levels coarse
    enough that a whole march block shares one 27-point lattice
    (spec.dedup_group_sizes)."""
    batch_shape = x.shape[:-1]
    xt = x.reshape(-1, spec.n_input_dims).T  # (3, N)
    dedup_gs = spec.dedup_group_sizes

    outs, idxs, ws, gs, lattice = [], [], [], [], []
    for level in range(spec.n_levels):
        if dedup_gs[level]:
            feat, lat = _level_lattice_feat(
                params, xt, spec, level, dedup_gs[level]
            )
            lattice.append(lat)
        else:
            idx, w = _level_corner_indices(spec, xt, level)  # (8, N)
            g = jnp.take(params, idx, axis=1)  # (F, 8, N)
            feat = (g * w[None].astype(params.dtype)).sum(axis=1)  # (F, N)
            idxs.append(idx)
            ws.append(w)
            gs.append(g)
        if level_mask is not None:
            feat = feat * level_mask[level].astype(feat.dtype)
        outs.append(feat)
    out = jnp.concatenate(outs, axis=0)  # (L*F, N)
    out = out.T.reshape(*batch_shape, spec.n_output_dims)
    if idxs:
        taps = (jnp.stack(idxs), jnp.stack(ws), jnp.stack(gs))
    else:
        taps = None
    return out, (taps, tuple(lattice))


def _encode_fast_fwd(params, x, spec, level_mask=None):
    out, taps = _encode_with_taps(params, x, spec, level_mask)
    return out, (x, level_mask, taps)


# static (8, 3) corner bit pattern and per-dim signs
_CORNER_BITS = np.array(
    [[(c >> d) & 1 for d in range(3)] for c in range(8)], dtype=np.float32
)  # (8, 3)
_CORNER_SIGNS = _CORNER_BITS * 2.0 - 1.0


def _level_dx(spec, xt, g, g_l, level):
    """Position cotangent of one level: dL/dx_d = sum_c dw_c/dx_d * (T[idx_c].g),
    vectorized over corners, from the SAVED tap values ``g`` (F, 8, N)."""
    tg = (g.astype(jnp.float32) * g_l.T[:, None, :]).sum(axis=0)  # (8, N)
    s = jnp.float32(spec.scales[level])
    pos = xt.astype(jnp.float32) * s + 0.5
    frac = pos - jnp.floor(pos)  # (3, N)
    bits = jnp.asarray(_CORNER_BITS)[:, :, None]  # (8, 3, 1)
    p = bits * frac[None] + (1.0 - bits) * (1.0 - frac[None])  # (8, 3, N)
    # product over the other two dims, per dim (3 dims: explicit partials)
    prod_excl = jnp.stack(
        [p[:, 1] * p[:, 2], p[:, 0] * p[:, 2], p[:, 0] * p[:, 1]], axis=1
    )  # (8, 3, N)
    signs = jnp.asarray(_CORNER_SIGNS)[:, :, None]  # (8, 3, 1)
    return (signs * prod_excl * tg[:, None, :]).sum(axis=0) * s  # (3, N)


def _encode_fast_bwd(spec, res, ct):
    """Backward from saved taps: no re-hash, no re-gather (the re-gather of
    all L*8*N taps alone cost ~140 ms/step at the reference workload).
    Table gradients: two-sort segment sum for big (hashed) levels, one-hot
    MXU matmul for small dense levels (_SORT_GRAD_MIN_SIZE crossover).
    Dedup levels (spec.dedup_group_sizes) feed 27*B lattice-row updates
    instead of 8*N per-corner updates through the same machinery."""
    x, level_mask, (taps, lattice) = res
    batch_shape = x.shape[:-1]
    xt = x.reshape(-1, spec.n_input_dims).T  # (3, N)
    n = xt.shape[1]
    f = spec.n_features_per_level
    ct2 = ct.reshape(-1, spec.n_levels, f)  # (N, L, F)
    dedup_gs = spec.dedup_group_sizes

    # per-level update streams: level -> (local_idx (M,), wg (M, F) f32)
    streams: dict[int, tuple] = {}
    dx_t = jnp.zeros_like(xt)
    tab_dtype = None
    if taps is not None:
        idx_all, w_all, g_all = taps
        tab_dtype = g_all.dtype
        ps_levels = [l for l in range(spec.n_levels) if not dedup_gs[l]]
        for pi, level in enumerate(ps_levels):
            g_l = ct2[:, level, :]  # (N, F)
            if level_mask is not None:
                g_l = g_l * level_mask[level].astype(g_l.dtype)
            w = w_all[pi]  # (8, N)
            wg = (w[:, :, None] * g_l[None, :, :]).reshape(8 * n, f)
            li = (
                idx_all[pi] - np.int32(spec.level_offsets[level])
            ).reshape(8 * n)
            streams[level] = (li, wg.astype(jnp.float32))
            dx_t = dx_t + _level_dx(spec, xt, g_all[pi], g_l, level)
    for j, level in enumerate(
        l for l in range(spec.n_levels) if dedup_gs[l]
    ):
        idx, gvals, a = lattice[j]
        tab_dtype = gvals.dtype if tab_dtype is None else tab_dtype
        ct_l = ct2[:, level, :].astype(jnp.float32)
        if level_mask is not None:
            ct_l = ct_l * level_mask[level].astype(ct_l.dtype)
        li, wg, dxl = _level_lattice_bwd(
            spec, xt, level, dedup_gs[level], idx, gvals, a, ct_l
        )
        streams[level] = (li, wg)
        dx_t = dx_t + dxl

    # group levels whose update streams share (table size, row count) so
    # same-shape grad bodies compile once through a single lax.scan (the
    # hashed levels all share T = 2^log2_hashmap_size)
    sizes = spec.level_sizes
    groups: dict[tuple[int, int], list[int]] = {}
    for level in range(spec.n_levels):
        key = (sizes[level], int(streams[level][0].shape[0]))
        groups.setdefault(key, []).append(level)

    dtable_parts: dict[int, jax.Array] = {}
    for (t_l, _rows), levels in groups.items():
        level_grad = (
            _level_table_grad_sort
            if t_l >= _SORT_GRAD_MIN_SIZE
            else _level_table_grad_matmul
        )
        if len(levels) == 1:
            li, wg = streams[levels[0]]
            dtable_parts[levels[0]] = level_grad(li, wg, t_l)
        else:
            # one scanned body for the whole same-shape group
            stacked_idx = jnp.stack([streams[l][0] for l in levels])
            stacked_wg = jnp.stack([streams[l][1] for l in levels])

            def body(carry, inp, _grad=level_grad, _t=t_l):
                li, lwg = inp
                return carry, _grad(li, lwg, _t)

            _, grads = jax.lax.scan(body, None, (stacked_idx, stacked_wg))
            for gi, level in enumerate(levels):
                dtable_parts[level] = grads[gi]

    dtable = jnp.concatenate(
        [dtable_parts[level] for level in range(spec.n_levels)], axis=1
    ).astype(tab_dtype)
    dx = dx_t.T.reshape(*batch_shape, spec.n_input_dims).astype(x.dtype)
    dmask = None if level_mask is None else jnp.zeros_like(level_mask)
    return dtable, dx, dmask


hashgrid_encode_fast.defvjp(_encode_fast_fwd, _encode_fast_bwd)


# ---------------------------------------------------------------------------
# Fast encode WITH analytic position Jacobian (second-order capable)
# ---------------------------------------------------------------------------
#
# The NeuS analytic-gradient geometry needs d(encode)/dx inside the training
# graph (eikonal loss; reference contract models/geometry.py:176-180), i.e.
# the loss backward differentiates THROUGH the encoding's spatial gradient —
# a second-order graph. The plain fast path (custom_vjp) cannot be composed
# with forward-mode, so TPU NeuS used to fall back to the autodiff
# scatter-add encode (~58 ns/update serial loops).
#
# Instead, this op returns the features AND their analytic Jacobian w.r.t.
# x from ONE set of gathers (the Jacobian is a reweighted sum of the same 8
# corner rows), and its hand-written backward consumes cotangents of BOTH
# outputs:   dT[idx_c] += w_c ct_feat + sum_d dw_c/dx_d ct_jac_d   (fused
# segment-sum per level) and dx uses the trilinear mixed second derivatives
# (d2w/dx_d dx_e, e != d; the diagonal is zero). The NeuS geometry then
# builds sdf gradients by chaining jac with a plain (smooth, autodiff-safe)
# VJP of the MLP — no forward-mode ever touches a custom op. This is the
# role of tcnn's hashgrid "backward-backward" CUDA kernels, restructured so
# one first-order custom VJP contains all the hard parts.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode_with_jac(params, x, spec: HashGridSpec, level_mask=None):
    """Encode + analytic position Jacobian.

    Returns:
      feat: (..., L*F) features (same as hashgrid_encode).
      jac:  (3, ..., L*F) d feat / d x (coordinate-major: keeps the large
        axes last for the TPU (8,128) tile layout).
    """
    out, _ = _encode_jac_fwd_impl(params, x, spec, level_mask)
    return out


def _jac_weights(spec, xt, level):
    """d w_c / d frac_d and the corner products needed for the Jacobian.

    Returns (dw, frac) with dw: (8, 3, N) = dw_c/dx_d in GRID units (multiply
    by scale for world units is folded in by callers via spec.scales)."""
    s = jnp.float32(spec.scales[level])
    pos = xt.astype(jnp.float32) * s + 0.5
    frac = pos - jnp.floor(pos)  # (3, N)
    bits = jnp.asarray(_CORNER_BITS)[:, :, None]  # (8, 3, 1)
    p = bits * frac[None] + (1.0 - bits) * (1.0 - frac[None])  # (8, 3, N)
    prod_excl = jnp.stack(
        [p[:, 1] * p[:, 2], p[:, 0] * p[:, 2], p[:, 0] * p[:, 1]], axis=1
    )  # (8, 3, N): prod over dims != d
    signs = jnp.asarray(_CORNER_SIGNS)[:, :, None]  # (8, 3, 1)
    dw = signs * prod_excl * s  # (8, 3, N) in world units
    return dw, p, signs, s


def _encode_jac_fwd_impl(params, x, spec, level_mask):
    batch_shape = x.shape[:-1]
    xt = x.reshape(-1, spec.n_input_dims).T  # (3, N)
    n = xt.shape[1]
    dedup_gs = spec.dedup_group_sizes

    outs, jacs, idxs, ws, gs, lattice = [], [], [], [], [], []
    for level in range(spec.n_levels):
        if dedup_gs[level]:
            feat, jac_l, lat = _level_lattice_feat_jac(
                params, xt, spec, level, dedup_gs[level]
            )
            lattice.append(lat)
        else:
            idx, w = _level_corner_indices(spec, xt, level)  # (8, N)
            g = jnp.take(params, idx, axis=1)  # (F, 8, N)
            feat = (g * w[None].astype(params.dtype)).sum(axis=1)  # (F, N)
            dw, _, _, _ = _jac_weights(spec, xt, level)  # (8, 3, N)
            # jac_l: (3, F, N) = sum_c dw[c, d] * g[:, c]
            jac_l = jnp.einsum("cdn,fcn->dfn", dw, g.astype(jnp.float32))
            idxs.append(idx)
            ws.append(w)
            gs.append(g)
        if level_mask is not None:
            m = level_mask[level]
            feat = feat * m.astype(feat.dtype)
            jac_l = jac_l * m.astype(jac_l.dtype)
        outs.append(feat)
        jacs.append(jac_l)
    out = jnp.concatenate(outs, axis=0)  # (L*F, N)
    out = out.T.reshape(*batch_shape, spec.n_output_dims)
    jac = jnp.concatenate(jacs, axis=1)  # (3, L*F, N)
    jac = jac.transpose(0, 2, 1).reshape(3, *batch_shape, spec.n_output_dims)
    taps = (
        (jnp.stack(idxs), jnp.stack(ws), jnp.stack(gs)) if idxs else None
    )
    return (out, jac.astype(out.dtype)), (taps, tuple(lattice))


def _encode_jac_fwd(params, x, spec, level_mask=None):
    out, taps = _encode_jac_fwd_impl(params, x, spec, level_mask)
    return out, (x, level_mask, taps)


def _encode_jac_bwd(spec, res, cts):
    """Hand-written second-order backward: cotangents of (feat, jac) ->
    (dtable, dx, dmask). Dedup levels (spec.dedup_group_sizes) feed 27*B
    lattice-row update streams instead of 8*N per-corner updates."""
    ct_feat, ct_jac = cts
    x, level_mask, (taps, lattice) = res
    batch_shape = x.shape[:-1]
    xt = x.reshape(-1, spec.n_input_dims).T  # (3, N)
    n = xt.shape[1]
    f = spec.n_features_per_level
    ctf = ct_feat.reshape(-1, spec.n_levels, f)  # (N, L, F)
    ctj = ct_jac.reshape(3, -1, spec.n_levels, f)  # (3, N, L, F)
    dedup_gs = spec.dedup_group_sizes

    streams: dict[int, tuple] = {}
    dx_t = jnp.zeros_like(xt, dtype=jnp.float32)
    tab_dtype = None
    if taps is not None:
        idx_all, w_all, g_all = taps
        tab_dtype = g_all.dtype
        ps_levels = [l for l in range(spec.n_levels) if not dedup_gs[l]]
        for pi, level in enumerate(ps_levels):
            g_f = ctf[:, level, :].astype(jnp.float32)  # (N, F)
            g_j = ctj[:, :, level, :].astype(jnp.float32)  # (3, N, F)
            if level_mask is not None:
                m = level_mask[level].astype(jnp.float32)
                g_f = g_f * m
                g_j = g_j * m
            w = w_all[pi]  # (8, N)
            dw, p, signs, s = _jac_weights(spec, xt, level)  # dw: (8,3,N)
            g = g_all[pi].astype(jnp.float32)  # (F, 8, N)

            # --- table gradient: updates u_c = w_c ct_feat + sum_d dw_cd ct_jac_d
            upd = w[:, :, None] * g_f[None, :, :]  # (8, N, F)
            upd = upd + jnp.einsum("cdn,dnf->cnf", dw, g_j)
            li = (
                idx_all[pi] - np.int32(spec.level_offsets[level])
            ).reshape(8 * n)
            streams[level] = (li, upd.reshape(8 * n, f))

            # --- dx, term 1: feat cotangent through dw (same as _level_dx)
            tg_f = jnp.einsum("fcn,nf->cn", g, g_f)  # (8, N)
            dx_t = dx_t + jnp.einsum("cdn,cn->dn", dw, tg_f)

            # --- dx, term 2: jac cotangent through d2w/dx_e dx_d (e != d)
            # d2w_c/(dx_e dx_d) = s^2 sig_cd sig_ce p_cg (g = third dim)
            tg_j = jnp.einsum("fcn,enf->ecn", g, g_j)  # (3, 8, N)
            # other(d, e) = third dim index != d, e  (d != e)
            third = np.array(
                [[0, 2, 1], [2, 0, 0], [1, 0, 0]], dtype=np.int32
            )  # third[d][e]; diagonal unused
            for d in range(3):
                acc = jnp.zeros((n,), jnp.float32)
                for e in range(3):
                    if e == d:
                        continue
                    gdim = int(third[d][e])
                    d2 = (
                        signs[:, d] * signs[:, e] * p[:, gdim] * (s * s)
                    )  # (8, N)
                    acc = acc + (d2 * tg_j[e]).sum(axis=0)
                dx_t = dx_t.at[d].add(acc)

    for j, level in enumerate(
        l for l in range(spec.n_levels) if dedup_gs[l]
    ):
        idx, gvals, a = lattice[j]
        tab_dtype = gvals.dtype if tab_dtype is None else tab_dtype
        g_f = ctf[:, level, :].astype(jnp.float32)
        g_j = ctj[:, :, level, :].astype(jnp.float32)
        if level_mask is not None:
            m = level_mask[level].astype(jnp.float32)
            g_f = g_f * m
            g_j = g_j * m
        li, wg, dxl = _level_lattice_jac_bwd(
            spec, xt, level, dedup_gs[level], idx, gvals, a, g_f, g_j
        )
        streams[level] = (li, wg)
        dx_t = dx_t + dxl

    sizes = spec.level_sizes
    groups: dict[tuple[int, int], list[int]] = {}
    for level in range(spec.n_levels):
        key = (sizes[level], int(streams[level][0].shape[0]))
        groups.setdefault(key, []).append(level)

    dtable_parts: dict[int, jax.Array] = {}
    for (t_l, _rows), levels in groups.items():
        level_grad = (
            _level_table_grad_sort
            if t_l >= _SORT_GRAD_MIN_SIZE
            else _level_table_grad_matmul
        )
        if len(levels) == 1:
            li, wg = streams[levels[0]]
            dtable_parts[levels[0]] = level_grad(li, wg, t_l)
        else:
            stacked_idx = jnp.stack([streams[l][0] for l in levels])
            stacked_wg = jnp.stack([streams[l][1] for l in levels])

            def body(carry, inp, _grad=level_grad, _t=t_l):
                li, lwg = inp
                return carry, _grad(li, lwg, _t)

            _, grads = jax.lax.scan(body, None, (stacked_idx, stacked_wg))
            for gi, level in enumerate(levels):
                dtable_parts[level] = grads[gi]

    dtable = jnp.concatenate(
        [dtable_parts[level] for level in range(spec.n_levels)], axis=1
    ).astype(tab_dtype)
    dx = dx_t.T.reshape(*batch_shape, spec.n_input_dims).astype(x.dtype)
    dmask = None if level_mask is None else jnp.zeros_like(level_mask)
    return dtable, dx, dmask


hashgrid_encode_with_jac.defvjp(_encode_jac_fwd, _encode_jac_bwd)
