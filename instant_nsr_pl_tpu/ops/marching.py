"""Occupancy grid + static-shape ray marching (the nerfacc role).

Replaces nerfacc 0.3.3's ``OccupancyGrid`` and CUDA ``ray_marching``
(reference use: models/nerf.py:37-41,82-93; models/neus.py:64-74,159-169,
209-220) with a TPU-first design:

- the grid is a functional pytree (float EMA values + binary field), updated
  by a jitted collective-friendly function with the same semantics as
  nerfacc's ``every_n_step``: warmup evaluates all cells, afterwards a
  uniform + occupied cell sample; ``occ <- max(occ * 0.95, new)``; binarize at
  ``occ > min(mean(occ), occ_thre)``;
- marching emits a *fixed-capacity packed* sample buffer instead of nerfacc's
  ragged packed tensors: candidate samples are laid out densely as
  ``[n_rays, max_samples]`` (uniform or cone-angle exponential stepping with
  stratified jitter), masked by range + occupancy, then compacted with a
  static-size ``jnp.nonzero`` so the expensive field evaluations downstream
  only touch live samples. Static shapes keep XLA to a single compilation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from instant_nsr_pl_tpu.ops.contraction import (
    ContractionType,
    contract_coords,
    uncontract_from_unisphere,
)


# ---------------------------------------------------------------------------
# Occupancy grid
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OccGridSpec:
    """Static occupancy-grid description (hashable)."""

    resolution: int = 128
    radius: float = 1.5
    contraction_type: ContractionType = ContractionType.AABB

    @property
    def num_cells(self) -> int:
        return self.resolution**3


class OccupancyGridState(NamedTuple):
    """EMA occupancy values + binarized field, flattened x-fastest
    (``i = x + y*R + z*R^2``). ``binary_dilated`` is the 3^3 max-pool of
    ``binary`` — a conservative superset used by the strided march lookup
    (one occupancy probe per group of consecutive samples). ``bricks`` is
    the dilated field re-packed into overlapping bit-bricks
    (``pack_bricks``) so the march can fetch one WIDE gather row per RUN
    of consecutive probes instead of one narrow row each — XLA's TPU
    gather costs ~6-8 ns per ROW regardless of width (PERF.md), so
    row-sharing is the only way to shrink probe cost without changing
    semantics; a (1, 128) dummy for grids that can't use it."""

    occs: jax.Array  # (R^3,) float32
    binary: jax.Array  # (R^3,) bool
    binary_dilated: jax.Array  # (R^3,) bool
    bricks: jax.Array  # ((R/8)^3, 128) uint32


def _wants_bricks(spec: OccGridSpec) -> bool:
    # the brick probe needs linear (AABB) cell coords and a divisible grid;
    # unbounded (contracted) grids use per-sample probing anyway
    return (
        spec.resolution % 8 == 0
        and spec.contraction_type == ContractionType.AABB
    )


def _bricks_of(binary_dilated, spec: OccGridSpec):
    if not _wants_bricks(spec):
        return jnp.zeros((1, 128), jnp.uint32)
    return pack_bricks(binary_dilated, spec.resolution)


def occupancy_grid_init(spec: OccGridSpec) -> OccupancyGridState:
    n = spec.num_cells
    nb = (spec.resolution // 8) ** 3 if _wants_bricks(spec) else 1
    return OccupancyGridState(
        occs=jnp.zeros((n,), jnp.float32),
        binary=jnp.zeros((n,), bool),
        binary_dilated=jnp.zeros((n,), bool),
        bricks=jnp.zeros((nb, 128), jnp.uint32),
    )


def _dilate_binary(binary, resolution):
    """3^3 max-pool of the flattened binary field."""
    b = binary.reshape(resolution, resolution, resolution)
    d = jax.lax.reduce_window(
        b, False, jax.lax.bitwise_or, (3, 3, 3), (1, 1, 1), "SAME"
    )
    return d.reshape(-1)


# -- packed-bit grid post-processing ----------------------------------------
# The per-update dilate (reduce_window, ~3 ms) and brick assembly (bool-cube
# reshuffle, ~8 ms) both shrink ~10x when run on a bit-PACKED field: x-axis
# dilation is three shifts with cross-word carries, y/z are ORs of neighbor
# rows, and brick words are halfword extracts + reshapes. Bit-exact twins of
# (_dilate_binary, pack_bricks); used when resolution % 32 == 0.


def _pack_words(binary, res):
    """(res^3,) bool x-fastest -> (res, res, res//32) uint32."""
    b = binary.reshape(res, res, res // 32, 32).astype(jnp.uint32)
    return (b << jnp.arange(32, dtype=jnp.uint32)).sum(-1, dtype=jnp.uint32)


def _unpack_words(W, res):
    bits = (W[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    return bits.astype(bool).reshape(-1)


def _dilate_words(W):
    left = jnp.concatenate([W[..., 1:], jnp.zeros_like(W[..., :1])], -1)
    right = jnp.concatenate([jnp.zeros_like(W[..., :1]), W[..., :-1]], -1)
    x = W | (W << 1) | (W >> 1) | (left << 31) | (right >> 31)
    yp = jnp.zeros_like(x[:, :1])
    y = x | jnp.concatenate([x[:, 1:], yp], 1) | jnp.concatenate([yp, x[:, :-1]], 1)
    zp = jnp.zeros_like(y[:1])
    return y | jnp.concatenate([y[1:], zp], 0) | jnp.concatenate([zp, y[:-1]], 0)


def _bricks_from_words(W, res):
    """Dilated word field -> ``pack_bricks`` layout, via halfword planes."""
    nb = res // 8
    Wp = jnp.concatenate([W, jnp.zeros_like(W[..., :1])], -1)
    planes = []
    for bx in range(nb):
        xs = 8 * bx
        wx, sh = xs >> 5, xs & 31
        val = Wp[..., wx] >> sh
        if sh:
            val = val | (Wp[..., wx + 1] << (32 - sh))
        planes.append(val & jnp.uint32(0xFFFF))
    H = jnp.stack(planes)  # (bx, z, y): 16 bits from x = 8*bx
    Hp = jnp.pad(H, ((0, 0), (0, 8), (0, 8)))
    X = Hp.reshape(nb, nb + 1, 8, nb + 1, 8)  # [bx, zb, lz8, yb, ly8]
    parts = [X[:, dz:nb + dz, :, dy:nb + dy, :] for dz in (0, 1) for dy in (0, 1)]
    S = jnp.stack(parts).reshape(2, 2, nb, nb, 8, nb, 8)
    A = S.transpose(3, 5, 2, 0, 4, 1, 6).reshape(nb, nb, nb, 16, 16)
    W16 = A.reshape(nb, nb, nb, 16, 8, 2)
    words = W16[..., 0] | (W16[..., 1] << 16)  # [lz, lyh]
    return words.reshape(nb**3, 128)


def _postprocess_binary(binary, spec: OccGridSpec):
    """binary -> (binary_dilated bool, bricks) via the packed-bit pipeline
    when the resolution allows, else the plain twins."""
    res = spec.resolution
    if res % 32 == 0:
        Wd = _dilate_words(_pack_words(binary, res))
        dilated = _unpack_words(Wd, res)
        bricks = (
            _bricks_from_words(Wd, res)
            if _wants_bricks(spec)
            else jnp.zeros((1, 128), jnp.uint32)
        )
        return dilated, bricks
    dilated = _dilate_binary(binary, res)
    return dilated, _bricks_of(dilated, spec)


BRICK_RUN = 4  # consecutive probes sharing one brick-row gather


def pack_bricks(binary, resolution: int):
    """Re-pack a flattened binary field (x-fastest) into OVERLAPPING
    16^3-cell bit-bricks at stride 8: brick (bz, by, bx) covers cells
    ``[8*b, 8*b + 16)`` per axis, so ANY run of cells with per-axis extent
    <= 8 fits entirely inside the brick of its min corner. Returns
    ``((res/8)^3, 128) uint32``: bit ``lx + 16*ly + 256*lz`` of brick-local
    cell (lx, ly, lz) lives in word ``(ly >> 1) + 8*lz`` at position
    ``lx + 16*(ly & 1)``.

    Built gather-free (pad + reshape + 8 shifted slices + shift-sum); cost
    ~6 ms on v5e at 128^3, amortized over the grid-update cadence."""
    res = resolution
    nb = res // 8
    b = binary.reshape(res, res, res)  # [z, y, x]
    p = jnp.pad(b, ((0, 8),) * 3)
    X = p.reshape(nb + 1, 8, nb + 1, 8, nb + 1, 8).transpose(0, 2, 4, 1, 3, 5)
    parts = [
        X[dz:nb + dz, dy:nb + dy, dx:nb + dx]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    cube = jnp.stack(parts).reshape(2, 2, 2, nb, nb, nb, 8, 8, 8)
    cube = cube.transpose(3, 4, 5, 0, 6, 1, 7, 2, 8).reshape(nb**3, 16, 16, 16)
    c = cube.reshape(nb**3, 16, 8, 2, 16).astype(jnp.uint32)  # [lz,lyh,lyl,lx]
    lx = jnp.arange(16, dtype=jnp.uint32)[None, None, None, None, :]
    lyl = jnp.arange(2, dtype=jnp.uint32)[None, None, None, :, None]
    words = (c << (lx + 16 * lyl)).sum(axis=(3, 4), dtype=jnp.uint32)
    return words.reshape(nb**3, 128)  # word index = lyh + 8*lz


def probe_bricks_coords(bricks, cx, cy, cz, resolution: int):
    """Occupancy of cells (..., G) given CLAMPED int32 cell coords, where
    each aligned run of BRICK_RUN consecutive probes spans <= 8 cells per
    axis (caller-guaranteed: (BRICK_RUN-1) * k * step <= 7 * cell). ONE
    wide gather per run + in-register lane select and bit extract; value
    is bit-identical to ``binary_dilated[flat]``."""
    nb = resolution // 8
    shp = cx.shape
    r = BRICK_RUN
    rx = cx.reshape(-1, r)
    ry = cy.reshape(-1, r)
    rz = cz.reshape(-1, r)
    bx = jnp.min(rx, 1) >> 3
    by = jnp.min(ry, 1) >> 3
    bz = jnp.min(rz, 1) >> 3
    bid = (bz * nb + by) * nb + bx  # (M,)
    rows = bricks[bid]  # (M, 128) uint32 — the only gather
    lx = (rx - (bx << 3)[:, None]).astype(jnp.uint32)
    ly = (ry - (by << 3)[:, None]).astype(jnp.uint32)
    lz = (rz - (bz << 3)[:, None]).astype(jnp.uint32)
    w = ((ly >> 1) + 8 * lz).astype(jnp.int32)  # (M, r)
    bit = lx + 16 * (ly & 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rx.shape[0], r, 128), 2)
    sel = lanes == w[..., None]
    # XLA fuses the compare + select into the lane reduction (nothing
    # (M, r, 128)-shaped reaches HBM)
    word = jnp.where(sel, rows[:, None, :], jnp.uint32(0)).sum(
        -1, dtype=jnp.uint32
    )
    return ((word >> bit) & 1).astype(bool).reshape(shp)


def _lane_min_pow2(x, r: int):
    """Min over aligned r-lane groups (r a power of two): (R, L) -> (R, L/r)
    via pairwise lane-strided minima (cheap lane shuffles; never builds an
    (M, r)-shaped tensor whose unit-ish trailing dim XLA tile-pads 32x)."""
    while r > 1:
        x = jnp.minimum(x[:, 0::2], x[:, 1::2])
        r //= 2
    return x


def probe_bricks_lanes(bricks, cx, cy, cz, resolution: int):
    """Lane-native variant of :func:`probe_bricks_coords` for (R, SG) int32
    cell coords (SG % BRICK_RUN == 0, runs aligned along the lane axis).

    Same math, bit-identical results; all intermediates stay (R, SG) or
    (R, SG/r, 128) — shapes whose minor dims map onto the (8, 128) tile
    without padding. The round-2 step trace showed ~2 ms/step of pure
    relayout (broadcast/reshape/copy) from the (M, r)-shaped formulation."""
    nb = resolution // 8
    r = BRICK_RUN
    R, SG = cx.shape
    bx = _lane_min_pow2(cx, r)  # (R, SG/r) run-min cell coords
    by = _lane_min_pow2(cy, r)
    bz = _lane_min_pow2(cz, r)
    bbx, bby, bbz = bx >> 3, by >> 3, bz >> 3
    bid = (bbz * nb + bby) * nb + bbx  # (R, SG/r)
    rows = bricks[bid.reshape(-1)].reshape(R, SG // r, 128)  # the only gather
    # ONE run->group expansion (bid), brick coords recovered per group by
    # modular arithmetic: each jnp.repeat materializes a 32x-tile-padded
    # (R, SG/r, r) intermediate (~0.2 ms each in the step trace), so three
    # coordinate repeats cost ~3x this single one
    bidr = jnp.repeat(bid, r, axis=1)  # (R, SG)
    bxr = (bidr % nb) << 3
    byr = ((bidr // nb) % nb) << 3
    bzr = (bidr // (nb * nb)) << 3
    lx = (cx - bxr).astype(jnp.uint32)
    ly = (cy - byr).astype(jnp.uint32)
    lz = (cz - bzr).astype(jnp.uint32)
    w = ((ly >> 1) + 8 * lz).astype(jnp.int32)  # (R, SG) word index
    bit = lx + 16 * (ly & 1)
    # virtual (R, SG, 128) select-reduce: the repeat is a broadcast + a
    # row-major-preserving reshape, both fusable — rows stream from HBM
    # once, nothing (R, SG, 128)-shaped is materialized. The BIT is
    # extracted inside the same select (shift per group, broadcast over
    # lanes): selecting the u32 word first produced a T(4,128)-tiled
    # (R, SG/r, r) output plus a layout copy + flatten (~0.4 ms/step in
    # the trace) before the bit test could run.
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (R, SG // r, 128), 2)
    # ONE streaming pass + ONE lane reduction for all r groups of a run:
    # each group's bit lands at a distinct position of a packed u32 (for a
    # given j at most one lane matches w_j, so the lane-sum accumulates
    # r independent 0/1 bits with no carries). The per-j formulation did
    # r separate 33.5M-element masked sum-reductions (975 us/step).
    packed = jnp.zeros((R, SG // r, 128), jnp.uint32)
    for j in range(r):
        wj = w[:, j::r]  # (R, SG/r) lane-strided
        bj = bit[:, j::r]
        bv = (rows >> bj[..., None]) & jnp.uint32(1)
        packed = packed + jnp.where(
            lanes2 == wj[..., None], bv << j, jnp.uint32(0)
        )
    packed = packed.sum(-1, dtype=jnp.uint32)  # (R, SG/r)
    hit = jnp.stack(
        [(packed >> j) & jnp.uint32(1) for j in range(r)], axis=2
    ).reshape(R, SG)
    return hit.astype(bool)


def _cell_coords(indices, resolution):
    ix = indices % resolution
    iy = (indices // resolution) % resolution
    iz = indices // (resolution * resolution)
    return jnp.stack([ix, iy, iz], axis=-1)


def occupancy_grid_update(
    state: OccupancyGridState,
    spec: OccGridSpec,
    rng,
    occ_eval_fn,
    occ_thre: float = 0.01,
    ema_decay: float = 0.95,
    warmup: bool = False,
    mesh=None,
    sample_divisor: int = 8,
    phase=None,
):
    """One nerfacc-style grid update. ``warmup`` (static) evaluates every cell
    (nerfacc: first 256 steps); otherwise refreshes ``num_cells //
    sample_divisor`` cells per update.

    Cell selection: with ``phase`` (a traced int scalar, normally the update
    ordinal mod ``sample_divisor``) the refreshed cells are the CONTIGUOUS
    slab ``[phase * m, (phase + 1) * m)`` — a rotating schedule that touches
    every cell exactly once per ``sample_divisor`` updates and turns the
    EMA read/write into two dynamic slices. With ``phase=None`` the legacy
    nerfacc-style sampling runs instead (uniform random + occupied via
    inverse CDF); it is semantically closer to the reference but costs
    ~45 ms more per update on v5e (524k-row gather + scatter at ~10 ns/row
    + a searchsorted that is itself a log-n gather chain), refreshes cells
    only in expectation, and evaluates 2x the cells for the same cadence.

    ``occ_eval_fn`` maps world positions (M, 3) -> occupancy values (M,)
    (density * step for NeRF, the NeuS alpha estimator for NeuS).

    With ``mesh`` (a 1-D device mesh with axis 'dp'), the expensive field
    evaluations are sharded over cells across devices and the results
    all-gathered, so every chip applies the identical update — the collective
    grid maintenance the reference's per-rank nerfacc grids never do
    (SURVEY.md §2c).
    """
    res = spec.resolution
    n = spec.num_cells
    k_idx, k_occ, k_jit = jax.random.split(rng, 3)

    slab = not warmup and phase is not None
    if warmup:
        indices = jnp.arange(n, dtype=jnp.int32)
    elif slab:
        m = n // sample_divisor
        phase = jnp.asarray(phase, jnp.int32) % sample_divisor
        start = phase * m
        indices = jnp.arange(m, dtype=jnp.int32) + start
    else:
        m = n // sample_divisor
        uniform = jax.random.randint(k_idx, (m,), 0, n, dtype=jnp.int32)
        # occupied-cell sampling via inverse-CDF over the binary field
        cdf = jnp.cumsum(state.binary.astype(jnp.int32))
        total = cdf[-1]
        u = jax.random.randint(k_occ, (m,), 0, jnp.maximum(total, 1))
        occupied = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
        occupied = jnp.clip(occupied, 0, n - 1)
        # if nothing is occupied yet, fall back to the uniform half
        occupied = jnp.where(total > 0, occupied, uniform)
        indices = jnp.concatenate([uniform, occupied])

    coords = _cell_coords(indices, res).astype(jnp.float32)
    jitter = jax.random.uniform(k_jit, coords.shape)
    unit = (coords + jitter) / res  # position in the contracted [0,1]^3 cube
    world = uncontract_from_unisphere(unit, spec.radius, spec.contraction_type)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        n_dev = int(mesh.devices.size)
        m = world.shape[0]
        pad = (-m) % n_dev
        world_p = jnp.pad(world, ((0, pad), (0, 0)))
        eval_sharded = jax.shard_map(
            lambda w: jnp.asarray(occ_eval_fn(w)).reshape(-1),
            mesh=mesh,
            in_specs=P("dp"),
            out_specs=P("dp"),
            check_vma=False,
        )
        occ = eval_sharded(world_p)[:m]
        # gather the sharded evaluations back to a REPLICATED array: the
        # grid state must stay fully replicated — every chip applies the
        # identical update, and checkpoint saving (rank 0 fetches the whole
        # state host-side) cannot read dp-sharded leaves under a
        # multi-process mesh
        from jax.sharding import NamedSharding

        occ = jax.lax.with_sharding_constraint(occ, NamedSharding(mesh, P()))
    else:
        occ = jnp.asarray(occ_eval_fn(world)).reshape(-1)
    occ = jax.lax.stop_gradient(occ)
    if warmup:
        occs = jnp.maximum(state.occs * ema_decay, occ)
    elif slab:
        cur = jax.lax.dynamic_slice(state.occs, (start,), (m,))
        occs = jax.lax.dynamic_update_slice(
            state.occs, jnp.maximum(cur * ema_decay, occ), (start,)
        )
    else:
        new_vals = jnp.maximum(state.occs[indices] * ema_decay, occ)
        occs = state.occs.at[indices].set(new_vals)
    thre = jnp.minimum(occs.mean(), occ_thre)
    binary = occs > thre
    dilated, bricks = _postprocess_binary(binary, spec)
    return OccupancyGridState(
        occs=occs,
        binary=binary,
        binary_dilated=dilated,
        bricks=bricks,
    )


def occupancy_lookup(binary, positions, spec: OccGridSpec):
    """Query the binary field at world positions (..., 3) -> bool (...)."""
    return occupancy_lookup_coords(
        binary,
        positions[..., 0],
        positions[..., 1],
        positions[..., 2],
        spec,
    )


def occupancy_cells_coords(px, py, pz, spec: OccGridSpec):
    """World coords -> clamped int32 cell coords + the in-domain unit test."""
    ux, uy, uz = contract_coords(px, py, pz, spec.radius, spec.contraction_type)
    res = spec.resolution
    cx = jnp.clip(jnp.floor(ux * res).astype(jnp.int32), 0, res - 1)
    cy = jnp.clip(jnp.floor(uy * res).astype(jnp.int32), 0, res - 1)
    cz = jnp.clip(jnp.floor(uz * res).astype(jnp.int32), 0, res - 1)
    inside = (
        (ux >= 0.0) & (ux < 1.0)
        & (uy >= 0.0) & (uy < 1.0)
        & (uz >= 0.0) & (uz < 1.0)
    )
    return cx, cy, cz, inside


def occupancy_lookup_coords(binary, px, py, pz, spec: OccGridSpec, clamp=False):
    """Coordinate-wise occupancy query (TPU layout: avoids (..., 3) arrays
    whose unit trailing axis XLA pads to a (8,128) tile).

    ``clamp=True`` clamps out-of-domain probes onto the boundary cell instead
    of returning False — used by the strided group probe, where group centers
    can fall just outside the domain while group members are inside (range
    validity is enforced separately per sample)."""
    ux, uy, uz = contract_coords(px, py, pz, spec.radius, spec.contraction_type)
    res = spec.resolution
    cx = jnp.clip(jnp.floor(ux * res).astype(jnp.int32), 0, res - 1)
    cy = jnp.clip(jnp.floor(uy * res).astype(jnp.int32), 0, res - 1)
    cz = jnp.clip(jnp.floor(uz * res).astype(jnp.int32), 0, res - 1)
    flat = cx + cy * res + cz * res * res
    if clamp:
        return binary[flat]
    inside = (
        (ux >= 0.0) & (ux < 1.0)
        & (uy >= 0.0) & (uy < 1.0)
        & (uz >= 0.0) & (uz < 1.0)
    )
    return binary[flat] & inside


# ---------------------------------------------------------------------------
# Ray marching
# ---------------------------------------------------------------------------


class PackedSamples(NamedTuple):
    """Fixed-capacity packed samples, sorted by ray (padding at the tail).

    The static-shape analog of nerfacc's ragged ``(ray_indices, t_starts,
    t_ends)`` packing."""

    ray_indices: jax.Array  # (CAP,) int32, ascending; padding = n_rays - 1
    t_starts: jax.Array  # (CAP,) float32
    t_ends: jax.Array  # (CAP,) float32
    valid: jax.Array  # (CAP,) bool
    num_valid: jax.Array  # () int32 — total live samples (pre-truncation)
    ray_kept: jax.Array  # (R,) bool — all of this ray's live samples fit in CAP
    ray_ends: jax.Array  # (R,) int32 — exclusive slot offset where ray r's
    # packed slots end (ray r occupies [ray_ends[r-1], ray_ends[r])); free
    # from the compaction cumsum, and lets compositing run scatter-free
    # (ops/rendering.py segment_sum_sorted: segmented cumsum + one gather
    # at these offsets instead of XLA's serial scatter loop)


def _t_schedule(t_min, render_step_size, cone_angle, max_samples):
    """Per-ray sample boundary distances t_0..t_S (S+1 values).

    cone_angle == 0: uniform stepping ``t_i = t_min + i * step``.
    cone_angle > 0: nerfacc's exponential stepping — the recurrence
    ``t_{k+1} = t_k + max(t_k * c, s)`` in closed form: linear until
    ``t >= s/c``, geometric with ratio (1+c) afterwards.
    """
    s = render_step_size
    i = jnp.arange(max_samples + 1, dtype=jnp.float32)[None, :]  # (1, S+1)
    t0 = t_min[:, None]  # (R, 1)
    if cone_angle <= 0.0:
        return t0 + i * s
    c = cone_angle
    switch = s / c
    n_lin = jnp.ceil(jnp.maximum(switch - t0, 0.0) / s)  # (R, 1)
    t_lin = t0 + jnp.minimum(i, n_lin) * s
    t_geo = (t0 + n_lin * s) * (1.0 + c) ** jnp.maximum(i - n_lin, 0.0)
    return jnp.where(i <= n_lin, t_lin, t_geo)


def _expand_groups(
    sel, num_valid, ray_kept, ray_ends, R, sg, k, t_min, t_max, step, capacity
):
    """Expand sorted fine-group ids (ascending flat id, padding = R*sg) into
    packed per-sample buffers, reconstructing distances analytically from
    the uniform step schedule ``t_start[ray, s] = t_min[ray] + s * step``
    (t_min includes the stratified jitter)."""
    # flat (CAP,) construction: every intermediate keeps the big axis as
    # the minor dim — the earlier (CAP/k, k) formulation lane-padded k=8
    # to 128 (16x) and showed up as ~0.5 ms of relayout in the step trace.
    # jnp.repeat(..., k) on the minor axis is a broadcast + row-major
    # reshape, both fusable.
    g_ray = jnp.minimum(sel, R * sg - 1).astype(jnp.int32) // sg  # (CAP/k,)
    cap = sel.shape[0] * k
    off = (jnp.arange(cap, dtype=jnp.int32) % k).astype(jnp.float32)
    # ONE group->sample expansion of the raw id; packed-flag / ray / group
    # index recovered arithmetically (each jnp.repeat materializes a
    # tile-padded (CAP/k, k) broadcast — CLAUDE.md round-4 lesson)
    sel_f = jnp.repeat(sel, k)  # (CAP,)
    gpf = sel_f < R * sg
    safe_f = jnp.minimum(sel_f, R * sg - 1).astype(jnp.int32)
    rayf = safe_f // sg
    s_idx = (safe_f % sg).astype(jnp.float32) * k + off  # (CAP,)
    # one paired row gather for (t_min, t_max): XLA's TPU gather costs
    # ~6 ns per ROW regardless of width, so two separate 1-wide gathers
    # cost twice this one (measured 234 us each at CAP/k = 32768)
    tmm = jnp.stack([t_min, t_max], axis=1)[g_ray]  # (CAP/k, 2)
    ts = jnp.repeat(tmm[:, 0], k) + s_idx * step
    te = ts + step
    in_range = 0.5 * (ts + te) < jnp.repeat(tmm[:, 1], k)
    pv = gpf & in_range
    ray_indices = jnp.where(gpf, rayf, R - 1)
    # out-of-range slots of a packed block KEEP their analytic schedule t
    # (only fully-dead padding blocks zero out): every aligned k-block is
    # then a uniform-step run of one ray, so downstream per-block
    # structure (hash-grid tap dedup, ops/hashgrid.py) stays sound. The
    # slots remain valid=False and are never composited.
    return PackedSamples(
        ray_indices=ray_indices.astype(jnp.int32),
        t_starts=jnp.where(gpf, ts, 0.0),
        t_ends=jnp.where(gpf, te, 0.0),
        valid=pv,
        num_valid=num_valid,
        ray_kept=ray_kept,
        ray_ends=ray_ends,
    )


_SELECT_Q = 4  # groups per super-group in the two-level compaction sort


def _select_groups(gvalid, R, sg, cap_g):
    """First ``cap_g`` valid group flat ids in ascending order (padding =
    R*sg) — the compaction selection.

    Two-level sort: the single R*sg-key sort was the march's second-largest
    bucket (1.11 ms at 1M keys, PERF.md round 4) while only ~4% of
    candidates are live at steady state. Level 1 sorts R*sg/Q SUPER-group
    keys with the Q-bit validity nibble packed into the low bits (no
    gather needed to recover member validity); level 2 sorts the Q*cap_g
    member candidates of the selected supers. Exact by construction: the
    first cap_g valid groups lie in at most cap_g distinct supers, and
    supers are selected in ascending flat order, so every one of those
    groups is a level-2 candidate; the level-2 sort then reproduces the
    single-sort output bit-for-bit."""
    q = _SELECT_Q
    sgq = sg // q
    if sg % q or R * sgq < cap_g:
        # tiny problems (or non-Q-divisible sg): single sort
        src = jnp.arange(R * sg, dtype=jnp.int32)
        keys = jnp.where(gvalid.reshape(-1), src, jnp.int32(R * sg))
        (sorted_keys,) = jax.lax.sort((keys,), num_keys=1)
        return sorted_keys[:cap_g]
    # validity nibble per super, built with lane-strided slices on the
    # (R, SG) layout (no trailing-dim-Q reshape: XLA tile-pads minor dims)
    nib = jnp.zeros((R, sgq), jnp.int32)
    for j in range(q):
        nib = nib + (gvalid[:, j::q].astype(jnp.int32) << j)
    # key = super_id << q | validity nibble (stride/mask derived from q so
    # _SELECT_Q stays tunable without breaking the decode)
    sup = jnp.arange(R * sgq, dtype=jnp.int32) << q
    max1 = jnp.int32(R * sgq << q)
    keys1 = jnp.where(nib.reshape(-1) > 0, sup + nib.reshape(-1), max1)
    (sorted1,) = jax.lax.sort((keys1,), num_keys=1)
    sel1 = sorted1[:cap_g]
    # padding supers decode to base == R*sg exactly, so no masking needed
    base = (sel1 >> q) * q
    nib_sel = sel1 & ((1 << q) - 1)
    keys2 = jnp.concatenate(
        [
            jnp.where(((nib_sel >> j) & 1) > 0, base + j, jnp.int32(R * sg))
            for j in range(q)
        ]
    )
    (sorted2,) = jax.lax.sort((keys2,), num_keys=1)
    return sorted2[:cap_g]


def _march_groups_lanes(
    rays_o, rays_d, t_min, t_max, *, render_step_size, max_samples,
    capacity, occ_spec, occ_dilated, occ_stride, occ_bricks,
):
    """Group-compacted strided march with every intermediate (R, S/k)-shaped.

    The general path materializes (R, S+1)/(R, S) schedules and reshapes
    probe data through (M, BRICK_RUN)-shaped tensors whose trailing dims
    XLA tile-pads to 128 lanes — the round-2 step trace measured ~2.5 ms
    of resulting broadcast/reshape/copy HLOs per step. Here the uniform
    step schedule is evaluated closed-form per GROUP (t[i] = t_min + i*s,
    float-expression-identical to _t_schedule's cone_angle<=0 branch, so
    packed outputs are bitwise equal) and per-sample validity counts are
    k fused (R, S/k) comparisons instead of an (R, S) materialization."""
    R = rays_o.shape[0]
    S = max_samples
    k = occ_stride
    step = render_step_size
    assert S % k == 0, (S, k)
    assert capacity % k == 0, (capacity, k)
    sg = S // k
    ig = jnp.arange(sg, dtype=jnp.float32)[None, :]  # (1, SG)
    t0 = t_min[:, None]

    # group-center distances (bitwise = 0.5*(t_bounds[:, ::k] + t_bounds[:, k::k]))
    t_c = 0.5 * ((t0 + (ig * k) * step) + (t0 + ((ig + 1.0) * k) * step))
    px = rays_o[:, 0:1] + rays_d[:, 0:1] * t_c  # (R, SG)
    py = rays_o[:, 1:2] + rays_d[:, 1:2] * t_c
    pz = rays_o[:, 2:3] + rays_d[:, 2:3] * t_c

    cell = 2.0 * occ_spec.radius / occ_spec.resolution
    use_bricks = (
        occ_bricks is not None
        and occ_bricks.shape[0] == (occ_spec.resolution // 8) ** 3
        and occ_spec.contraction_type == ContractionType.AABB
        and sg % BRICK_RUN == 0
        and (BRICK_RUN - 1) * k * step <= 7.0 * cell
    )
    if use_bricks:
        cx, cy, cz, _ = occupancy_cells_coords(px, py, pz, occ_spec)
        occ_g = probe_bricks_lanes(occ_bricks, cx, cy, cz, occ_spec.resolution)
    else:
        occ_g = occupancy_lookup_coords(
            occ_dilated, px, py, pz, occ_spec, clamp=True
        )

    # first-sample midpoint of each group (bitwise = t_mid[:, ::k])
    t_mid_g0 = 0.5 * ((t0 + (ig * k) * step) + (t0 + (ig * k + 1.0) * step))
    gvalid = occ_g & (t_mid_g0 < t_max[:, None])  # (R, SG)

    # true per-sample live count: k fused (R, SG) comparisons, each
    # bitwise-identical to the general path's per-sample t_mid < t_max
    tm = t_max[:, None]
    num_valid = jnp.int32(0)
    for j in range(k):
        t_mid_j = 0.5 * (
            (t0 + (ig * k + jnp.float32(j)) * step)
            + (t0 + (ig * k + jnp.float32(j + 1)) * step)
        )
        num_valid = num_valid + (occ_g & (t_mid_j < tm)).sum().astype(jnp.int32)

    sel = _select_groups(gvalid, R, sg, capacity // k)
    per_ray_g = gvalid.sum(axis=1)
    cum_g = jnp.cumsum(per_ray_g)
    ray_kept = cum_g * k <= capacity
    ray_ends = (jnp.minimum(cum_g, capacity // k) * k).astype(jnp.int32)
    return _expand_groups(
        sel, num_valid, ray_kept, ray_ends, R, sg, k, t_min, t_max,
        step, capacity,
    )


def march_rays(
    rays_o,
    rays_d,
    t_min,
    t_max,
    *,
    render_step_size: float,
    max_samples: int,
    capacity: int,
    cone_angle: float = 0.0,
    stratified: bool = False,
    rng=None,
    occ_binary=None,
    occ_spec: OccGridSpec | None = None,
    occ_dilated=None,
    occ_stride: int = 1,
    group_compact: bool = False,
    occ_bricks=None,
) -> PackedSamples:
    """March rays, prune with the occupancy grid, compact to ``capacity``.

    Args:
      rays_o, rays_d: (R, 3) world origins / unit directions.
      t_min, t_max: (R,) per-ray march range (e.g. from the AABB slab test).
      render_step_size: base step size s.
      max_samples: static S, candidate samples per ray.
      capacity: static CAP of the packed output buffer.
      cone_angle: >0 enables exponential stepping (unbounded scenes).
      stratified: jitter the per-ray start by U(0,1)*s (nerfacc's stratified).
      rng: PRNG key, required when stratified.
      occ_binary / occ_spec: optional binary occupancy field for pruning.
      occ_dilated / occ_stride: with stride k > 1, one occupancy probe per
        group of k consecutive samples against the DILATED field (probes are
        ~10 ns each on TPU — 8.4M per step at the reference workload — so
        the k-fold reduction matters; dilation keeps pruning conservative:
        extra passed samples only consume capacity, never bias the render).
        Requires uniform stepping (cone_angle == 0) and
        k * render_step_size <= 2 * cell_size.
      group_compact: compact at GROUP granularity (stride-k runs) instead of
        per sample: the compaction sort runs over R*S/k keys instead of R*S
        (the sort is the march's dominant cost at ~2 ns/key), and packed
        sample distances are reconstructed analytically from the uniform
        step schedule. Pruning is group-granular ALREADY on the strided
        path, so the only semantic change is that a ray's tail group may
        carry a few out-of-range slots (marked invalid, never composited)
        and capacity truncation happens at group boundaries.
      occ_bricks: the dilated field bit-packed into overlapping bricks
        (``OccupancyGridState.bricks``). When given (and the layout
        divides), the strided probe fetches ONE wide (128-word) gather row
        per run of BRICK_RUN consecutive group probes and extracts the
        bits in-register — bit-identical results at ~3.5x less probe cost
        (the gather is ~6-8 ns/ROW regardless of width; PERF.md). Needs
        AABB contraction and ``(BRICK_RUN - 1) * k * step <= 7 * cell``,
        which the model-level ``k * step <= 2 * cell`` choice implies.
    """
    R = rays_o.shape[0]
    S = max_samples
    t_min = jnp.asarray(t_min, jnp.float32)
    t_max = jnp.asarray(t_max, jnp.float32)
    if stratified:
        assert rng is not None
        jitter = jax.random.uniform(rng, (R,)) * render_step_size
        t_min = t_min + jitter

    if (
        group_compact
        and occ_binary is not None
        and occ_stride > 1
        and occ_dilated is not None
        and cone_angle <= 0.0
    ):
        # lane-native fast path: all intermediates (R, S/k)-shaped; no
        # (R, S) or (R, S+1) tensor is ever materialized (bit-identical
        # outputs to the general path below — tests/test_marching_group.py)
        return _march_groups_lanes(
            rays_o, rays_d, t_min, t_max,
            render_step_size=render_step_size, max_samples=S,
            capacity=capacity, occ_spec=occ_spec, occ_dilated=occ_dilated,
            occ_stride=occ_stride, occ_bricks=occ_bricks,
        )

    t_bounds = _t_schedule(t_min, render_step_size, cone_angle, S)  # (R, S+1)
    t_starts = t_bounds[:, :-1]
    t_ends = t_bounds[:, 1:]
    t_mid = 0.5 * (t_starts + t_ends)

    valid = t_mid < t_max[:, None]  # (R, S)
    occ_g = None
    if occ_binary is not None:
        if occ_stride > 1 and occ_dilated is not None:
            assert cone_angle <= 0.0, "strided lookup needs uniform stepping"
            assert S % occ_stride == 0, (S, occ_stride)
            s_g = S // occ_stride
            # group-center distances: midpoint of each k-sample group
            t_c = 0.5 * (
                t_bounds[:, : S : occ_stride] + t_bounds[:, occ_stride::occ_stride]
            )  # (R, S/k)
            px = rays_o[:, 0:1] + rays_d[:, 0:1] * t_c
            py = rays_o[:, 1:2] + rays_d[:, 1:2] * t_c
            pz = rays_o[:, 2:3] + rays_d[:, 2:3] * t_c
            cell = 2.0 * occ_spec.radius / occ_spec.resolution
            use_bricks = (
                occ_bricks is not None
                and occ_bricks.shape[0] == (occ_spec.resolution // 8) ** 3
                and occ_spec.contraction_type == ContractionType.AABB
                and s_g % BRICK_RUN == 0
                and cone_angle <= 0.0
                # run spread bound: cells of a BRICK_RUN probe run must fit
                # an 8-cell window (brick of the min corner)
                and (BRICK_RUN - 1) * occ_stride * render_step_size
                <= 7.0 * cell
            )
            if use_bricks:
                cx, cy, cz, _ = occupancy_cells_coords(px, py, pz, occ_spec)
                occ_g = probe_bricks_coords(
                    occ_bricks, cx, cy, cz, occ_spec.resolution
                )
            else:
                occ_g = occupancy_lookup_coords(
                    occ_dilated, px, py, pz, occ_spec, clamp=True
                )
            occ = jnp.repeat(occ_g, occ_stride, axis=1)  # (R, S)
        else:
            # per-coordinate (R, S) arrays; never materialize (R, S, 3)
            px = rays_o[:, 0:1] + rays_d[:, 0:1] * t_mid
            py = rays_o[:, 1:2] + rays_d[:, 1:2] * t_mid
            pz = rays_o[:, 2:3] + rays_d[:, 2:3] * t_mid
            occ = occupancy_lookup_coords(occ_binary, px, py, pz, occ_spec)
        valid = valid & occ

    if group_compact:
        # valid group_compact configs (strided + uniform + dilated field)
        # took the lane-native fast path above
        raise AssertionError(
            "group_compact requires the strided occupancy path "
            "(occ_stride > 1, occ_dilated given, uniform stepping)"
        )

    # compact: ray-major flat order keeps packed samples sorted by ray.
    # single key-sort (valid candidates keep their flat index as key, dead
    # ones are pushed to the tail) — XLA's TPU sort is vectorized (~0.5
    # ns/elt measured) while the previous cumsum + slot-scatter lowering
    # cost 47 ms at the reference 8.4M-candidate workload
    flat_valid = valid.reshape(-1)
    num_valid = flat_valid.sum().astype(jnp.int32)
    src = jnp.arange(R * S, dtype=jnp.int32)
    keys = jnp.where(flat_valid, src, jnp.int32(R * S))
    (sorted_keys,) = jax.lax.sort((keys,), num_keys=1)
    sel = sorted_keys[:capacity]
    packed_valid = sel < R * S
    safe = jnp.minimum(sel, R * S - 1).astype(jnp.int32)
    ray_indices = (safe // S).astype(jnp.int32)
    ray_indices = jnp.where(packed_valid, ray_indices, R - 1)
    # a ray is fully kept iff the cumulative live-sample count through it
    # fits in the capacity (truncated rays must be masked out of losses)
    per_ray = valid.sum(axis=1)
    cum = jnp.cumsum(per_ray)
    ray_kept = cum <= capacity
    return PackedSamples(
        ray_indices=ray_indices,
        t_starts=jnp.where(packed_valid, t_starts.reshape(-1)[safe], 0.0),
        t_ends=jnp.where(packed_valid, t_ends.reshape(-1)[safe], 0.0),
        valid=packed_valid,
        num_valid=num_valid,
        ray_kept=ray_kept,
        ray_ends=jnp.minimum(cum, capacity).astype(jnp.int32),
    )


def packed_positions(samples: PackedSamples, rays_o, rays_d, group: int = 1):
    """World positions / directions / midpoints / intervals of packed samples.

    ``group=k > 1`` asserts the group-compacted march's layout guarantee
    (every aligned k-block of the buffer belongs to one ray) and gathers
    the per-ray origin/direction once per BLOCK instead of once per sample
    — the gather is ~6-8 ns per row however narrow (PERF.md), so this cuts
    its cost k-fold (~5 ms -> ~0.6 ms at the reference workload)."""
    t_mid = 0.5 * (samples.t_starts + samples.t_ends)
    if group > 1:
        cap = samples.ray_indices.shape[0]
        assert cap % group == 0, (cap, group)
        g = cap // group
        gray = samples.ray_indices.reshape(g, group)[:, 0]
        og = rays_o[gray]  # (g, 3)
        dg = rays_d[gray]
        o = jnp.broadcast_to(og[:, None, :], (g, group, 3)).reshape(cap, 3)
        d = jnp.broadcast_to(dg[:, None, :], (g, group, 3)).reshape(cap, 3)
    else:
        o = rays_o[samples.ray_indices]
        d = rays_d[samples.ray_indices]
    positions = o + d * t_mid[:, None]
    intervals = samples.t_ends - samples.t_starts
    return positions, d, t_mid, intervals
