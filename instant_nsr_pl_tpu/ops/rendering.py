"""Differentiable volume-rendering compositing on packed sample buffers.

TPU-native replacement for nerfacc's CUDA ``render_weight_from_density``,
``render_weight_from_alpha`` and ``accumulate_along_rays`` (consumed by the
reference at models/nerf.py:105-108 and models/neus.py:181-184,237-242), plus
the MipNeRF-360 distortion loss (``flatten_eff_distloss``, systems/nerf.py:104).

Layout: samples live in a fixed-capacity packed buffer sorted by ray —
``ray_indices (CAP,) int32`` (ascending; padding rows carry ``valid=False``),
mirroring nerfacc's ragged packing but with a *static* capacity so XLA sees
one shape. Per-ray prefix products/sums are computed with a segmented
``jax.lax.associative_scan`` — O(log n) depth of pure VPU elementwise work,
numerically safe because sums never cross segment boundaries.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _segment_sum_sorted_impl(src, row_rays, ends):
    """Segmented inclusive cumsum + one gather at the per-ray end offsets."""
    prev = jnp.concatenate([jnp.full((1,), -1, row_rays.dtype), row_rays[:-1]])
    flags = (row_rays != prev)[:, None]  # (N, 1), broadcasts over features

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, bv + jnp.where(bf, 0.0, av)

    _, incl = jax.lax.associative_scan(combine, (flags, src))
    incl_x = jnp.concatenate(
        [jnp.zeros((1, src.shape[1]), src.dtype), incl], axis=0
    )
    starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    return jnp.where((ends > starts)[:, None], incl_x[ends], 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_sum_sorted(src, row_rays, ends, n_rows):
    """Scatter-free per-ray segment sum over a ray-sorted packed buffer.

    The nerfacc ``accumulate_along_rays`` contraction (reference use:
    models/nerf.py:105-108) as XLA-friendly vector ops: because the packed
    buffer is sorted by ray with each ray's slots contiguous, the per-ray
    sum is the segmented inclusive cumsum read at the ray's last slot —
    one O(log N) associative scan (pure VPU) plus ONE gather of ``n_rows``
    rows, instead of ``jax.ops.segment_sum``'s scatter-add, which the TPU
    backend (a) executes as a serial ~58 ns/update loop and (b) crashes on
    when two same-index scatters get horizontally fused into a variadic
    scatter (scatter_emitter CHECK, observed with the fused Pallas kernels
    active). The backward is the exact segment_sum VJP: a gather of each
    row's ray cotangent. No cancellation: the segmented scan resets at ray
    starts, so magnitudes stay per-ray.

    Args:
      src: (N, D) rows, already masked (invalid rows zero).
      row_rays: (N,) int32 ascending ray id per row (padding = n_rows - 1).
      ends: (n_rows,) int32 exclusive row offsets — ray r owns rows
        [ends[r-1], ends[r]) (``PackedSamples.ray_ends``, possibly divided
        by the block size when rows are pre-reduced blocks).
      n_rows: static number of rays.
    Returns:
      (n_rows, D) per-ray sums.
    """
    return _segment_sum_sorted_impl(src, row_rays, ends)


def _sss_fwd(src, row_rays, ends, n_rows):
    return _segment_sum_sorted_impl(src, row_rays, ends), row_rays


def _sss_bwd(n_rows, row_rays, ct):
    return ct[row_rays], None, None


segment_sum_sorted.defvjp(_sss_fwd, _sss_bwd)


def _lane_sum_pow2(x, r: int):
    """Sum over aligned r-lane groups (r a power of two): (D, L) -> (D, L/r)
    via pairwise lane-strided adds — never builds an (M, r, D)-shaped tensor
    whose small trailing dims XLA tile-pads 16-32x (PERF.md layout
    guardrails; same trick as ops/marching.py _lane_min_pow2)."""
    while r > 1:
        x = x[:, 0::2] + x[:, 1::2]
        r //= 2
    return x


def _segment_sum_sorted_fm_impl(src_t, row_rays, ends):
    """Feature-major twin of :func:`_segment_sum_sorted_impl`: src_t (D, G)
    keeps the LARGE axis last through the whole segmented scan, so no
    intermediate carries a tile-padded (G, D<128) shape."""
    prev = jnp.concatenate([jnp.full((1,), -1, row_rays.dtype), row_rays[:-1]])
    d = src_t.shape[0]
    # associative_scan needs all leaves to share the scan axis position;
    # the (D, G) broadcast of the bool flags is lane-cheap
    flags = jnp.broadcast_to((row_rays != prev)[None, :], src_t.shape)

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, bv + jnp.where(bf, 0.0, av)

    _, incl = jax.lax.associative_scan(combine, (flags, src_t), axis=-1)
    incl_x = jnp.concatenate(
        [jnp.zeros((d, 1), src_t.dtype), incl], axis=1
    )
    starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    out_t = jnp.where(
        (ends > starts)[None, :], jnp.take(incl_x, ends, axis=1), 0.0
    )
    return out_t.T  # (n_rows, D) — small, transpose at the boundary only


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_sum_sorted_fm(src_t, row_rays, ends, n_rows):
    """Feature-major :func:`segment_sum_sorted`: src_t (D, G) coordinate-
    major. Same contraction, but every (G,)-long intermediate keeps G on
    the lane axis (the (G, D=5) layout of the row-major path tile-pads its
    last dim 25x and the round-3 step trace showed the block-reduce +
    scan materializing those pads)."""
    return _segment_sum_sorted_fm_impl(src_t, row_rays, ends)


def _sss_fm_fwd(src_t, row_rays, ends, n_rows):
    return _segment_sum_sorted_fm_impl(src_t, row_rays, ends), row_rays


def _sss_fm_bwd(n_rows, row_rays, ct):
    return jnp.take(ct.T, row_rays, axis=1), None, None


segment_sum_sorted_fm.defvjp(_sss_fm_fwd, _sss_fm_bwd)


def _segment_starts(ray_indices, valid):
    """Boolean flags marking the first valid sample of each ray segment."""
    prev = jnp.concatenate([jnp.full((1,), -1, ray_indices.dtype), ray_indices[:-1]])
    return (ray_indices != prev) & valid


def segmented_cumsum(x, ray_indices, valid, exclusive=False, group=1):
    """Per-segment cumulative sum over a packed, ray-sorted buffer.

    Invalid (padding) entries contribute zero and receive well-defined values.

    ``group=k > 1`` asserts the caller's guarantee that every ALIGNED block
    of k consecutive entries belongs to a single ray (the layout the
    group-compacted march emits — ops/marching.py ``group_compact``). The
    scan then runs two-level: a vectorized within-block cumsum plus a
    k-times-smaller segmented scan over block totals, cutting the
    O(log CAP)-pass associative scan's data volume by k.
    """
    x = jnp.where(valid, x, 0.0)
    if group > 1:
        cap = x.shape[0]
        assert cap % group == 0, (cap, group)
        g = cap // group
        xb = x.reshape(g, group)
        incl_in = jnp.cumsum(xb, axis=1)  # within-block inclusive
        totals = incl_in[:, -1]  # (G,)
        gray = ray_indices.reshape(g, group)[:, 0]
        prev = jnp.concatenate([jnp.full((1,), -1, gray.dtype), gray[:-1]])
        flags = gray != prev  # block-level segment starts

        def combine(a, b):
            af, av = a
            bf, bv = b
            return af | bf, bv + jnp.where(bf, 0.0, av)

        _, incl_tot = jax.lax.associative_scan(combine, (flags, totals))
        out = (incl_in + (incl_tot - totals)[:, None]).reshape(-1)
        if exclusive:
            return out - x
        return out

    flags = _segment_starts(ray_indices, valid)

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, bv + jnp.where(bf, 0.0, av)

    _, incl = jax.lax.associative_scan(combine, (flags, x))
    if exclusive:
        return incl - x
    return incl


def exclusive_cumprod_segments(alpha, ray_indices, valid, eps=1e-10, group=1):
    """Per-ray exclusive cumulative product of (1 - alpha): the transmittance
    ``T_i = prod_{j<i in same ray} (1 - alpha_j)``."""
    log1m = jnp.log(jnp.clip(1.0 - alpha, eps, 1.0))
    excl = segmented_cumsum(log1m, ray_indices, valid, exclusive=True, group=group)
    return jnp.exp(excl)


def render_weight_from_density(t_starts, t_ends, sigma, ray_indices, valid, group=1):
    """Weights w_i = alpha_i * T_i with alpha = 1 - exp(-sigma * dt).

    Matches nerfacc's ``render_weight_from_density`` on packed samples
    (reference use: models/nerf.py:105).
    """
    dt = t_ends - t_starts
    alpha = 1.0 - jnp.exp(-sigma * dt)
    alpha = jnp.where(valid, alpha, 0.0)
    trans = exclusive_cumprod_segments(alpha, ray_indices, valid, group=group)
    return alpha * trans


def render_weight_from_alpha(alpha, ray_indices, valid, group=1):
    """Weights from per-sample alphas (NeuS path; reference: models/neus.py:237)."""
    alpha = jnp.where(valid, alpha, 0.0)
    trans = exclusive_cumprod_segments(alpha, ray_indices, valid, group=group)
    return alpha * trans


def accumulate_along_rays(
    weights, ray_indices, values=None, n_rays=None, valid=None, group=1,
    ends=None,
):
    """Per-ray sum of ``weights * values`` (nerfacc's ``accumulate_along_rays``).

    Args:
      weights: (CAP,)
      values: (CAP, D) or None (accumulates plain weights -> opacity).
      n_rays: static number of rays.
      group: block size k under the single-ray-per-aligned-block guarantee
        (see ``segmented_cumsum``): blocks are pre-reduced so the segment
        sum runs over CAP/k rows.
      ends: optional (n_rays,) ``PackedSamples.ray_ends`` slot offsets.
        When given, the contraction runs scatter-free
        (``segment_sum_sorted``); otherwise falls back to
        ``jax.ops.segment_sum`` (scatter-add) for callers without the
        packed-march layout guarantee.
    Returns:
      (n_rays, D) (D=1 when values is None).
    """
    assert n_rays is not None
    if valid is not None:
        weights = jnp.where(valid, weights, 0.0)
    if ends is not None and os.environ.get("INSR_ACC_FM"):
        # feature-major lane-native contraction — MEASURED REGRESSION on
        # v5e, kept opt-in as a documented experiment (PERF.md round 4):
        # the (D, G) associative_scan with minor-axis shifts compiled into
        # an 8.2 ms/step fusion vs ~0.7 ms for the row-major block-reduce +
        # (G, D) scan it replaced — the (G, D<128) tile pad this avoids is
        # cheaper than lane-axis scan shifts at D=5. Trace A/B:
        # scripts/trace_step.py, 20.47 vs 12.93 ms/step wall.
        if values is None:
            src_t = weights[None, :]  # (1, CAP)
        else:
            v = values[:, None] if values.ndim == 1 else values
            src_t = weights[None, :] * v.T  # (D, CAP)
        if group > 1:
            cap = src_t.shape[1]
            assert cap % group == 0, (cap, group)
            g = cap // group
            src_t = _lane_sum_pow2(src_t, group)  # (D, CAP/k)
            rows = ray_indices.reshape(g, group)[:, 0]
            return segment_sum_sorted_fm(src_t, rows, ends // group, n_rays)
        return segment_sum_sorted_fm(src_t, ray_indices, ends, n_rays)
    if values is None:
        src = weights[:, None]
    else:
        if values.ndim == 1:
            values = values[:, None]
        src = weights[:, None] * values
    if group > 1:
        cap, d = src.shape
        assert cap % group == 0, (cap, group)
        g = cap // group
        src = src.reshape(g, group, d).sum(axis=1)
        ray_indices = ray_indices.reshape(g, group)[:, 0]
    if ends is not None:
        e = ends // group if group > 1 else ends
        return segment_sum_sorted(src, ray_indices, e, n_rays)
    return jax.ops.segment_sum(
        src, ray_indices, num_segments=n_rays, indices_are_sorted=True
    )


def distortion_loss(
    weights, midpoints, intervals, ray_indices, valid, n_rays, group=1
):
    """MipNeRF-360 distortion loss on packed samples in O(N) via segmented
    prefix sums; the role of ``torch_efficient_distloss.flatten_eff_distloss``
    (reference: systems/nerf.py:104, systems/neus.py:132,137).

    loss = mean_rays[ sum_ij w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 d_i ]
    The pairwise term for samples sorted by t equals
    ``2 * sum_i w_i (m_i * W_{<i} - (wm)_{<i})``.
    """
    w = jnp.where(valid, weights, 0.0)
    m = midpoints
    wm = w * m
    w_prefix = segmented_cumsum(w, ray_indices, valid, exclusive=True, group=group)
    wm_prefix = segmented_cumsum(wm, ray_indices, valid, exclusive=True, group=group)
    loss_bi = 2.0 * (w * (m * w_prefix - wm_prefix))
    loss_uni = (1.0 / 3.0) * (w * w * intervals)
    total = jnp.sum(jnp.where(valid, loss_bi + loss_uni, 0.0))
    return total / n_rays
