"""Scatter-free compositing contraction (ops/rendering.py
``segment_sum_sorted``): must reproduce ``jax.ops.segment_sum`` values AND
gradients on ray-sorted packed buffers, including capacity truncation and
empty rays; the march must emit consistent ``ray_ends`` offsets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.ops.marching import march_rays
from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect
from instant_nsr_pl_tpu.ops.rendering import (
    accumulate_along_rays,
    segment_sum_sorted,
)


def _packed_case(rng, n_rays=17, cap=64, d=5, truncate=False):
    """Random ray-sorted packed buffer with empty rays and tail padding."""
    counts = rng.integers(0, 9, size=(n_rays,))
    counts[rng.integers(0, n_rays, size=3)] = 0  # force empty rays
    cum = np.minimum(np.cumsum(counts), cap if truncate else 10**9)
    total = int(cum[-1])
    assert total <= cap
    ray_indices = np.full((cap,), n_rays - 1, np.int32)
    pos = 0
    starts = np.concatenate([[0], cum[:-1]])
    for r in range(n_rays):
        n_r = int(cum[r] - starts[r])
        ray_indices[pos : pos + n_r] = r
        pos += n_r
    valid = np.zeros((cap,), bool)
    valid[:total] = True
    src = rng.normal(size=(cap, d)).astype(np.float32)
    return (
        jnp.asarray(src),
        jnp.asarray(ray_indices),
        jnp.asarray(valid),
        jnp.asarray(cum.astype(np.int32)),
        n_rays,
    )


@pytest.mark.parametrize("truncate", [False, True])
def test_segment_sum_sorted_matches_segment_sum(truncate):
    rng = np.random.default_rng(0 if not truncate else 1)
    src, ray_indices, valid, ends, n_rays = _packed_case(rng, truncate=truncate)
    src = jnp.where(valid[:, None], src, 0.0)
    got = segment_sum_sorted(src, ray_indices, ends, n_rays)
    want = jax.ops.segment_sum(
        src, ray_indices, num_segments=n_rays, indices_are_sorted=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_segment_sum_sorted_grad_matches():
    rng = np.random.default_rng(2)
    src, ray_indices, valid, ends, n_rays = _packed_case(rng)
    ct_seed = jnp.asarray(rng.normal(size=(n_rays, 5)).astype(np.float32))

    def loss_new(s):
        s = jnp.where(valid[:, None], s, 0.0)
        return (segment_sum_sorted(s, ray_indices, ends, n_rays) * ct_seed).sum()

    def loss_ref(s):
        s = jnp.where(valid[:, None], s, 0.0)
        out = jax.ops.segment_sum(
            s, ray_indices, num_segments=n_rays, indices_are_sorted=True
        )
        return (out * ct_seed).sum()

    g_new = jax.grad(loss_new)(src)
    g_ref = jax.grad(loss_ref)(src)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-5)


@pytest.mark.parametrize("group", [1, 4])
def test_accumulate_ends_path_matches_scatter_path(group):
    rng = np.random.default_rng(3 + group)
    n_rays, cap = 11, 96
    # group-aligned layout: counts in whole groups
    counts = rng.integers(0, 4, size=(n_rays,)) * group
    cum = np.minimum(np.cumsum(counts), cap)
    cum = (cum // group) * group
    ray_indices = np.full((cap,), n_rays - 1, np.int32)
    starts = np.concatenate([[0], cum[:-1]])
    for r in range(n_rays):
        ray_indices[int(starts[r]) : int(cum[r])] = r
    valid = np.zeros((cap,), bool)
    valid[: int(cum[-1])] = True
    # some invalid slots inside live blocks (group path's in_range=False)
    if group > 1 and cum[-1] >= group:
        valid[int(cum[-1]) - 1] = False
    weights = jnp.asarray(rng.random(cap).astype(np.float32))
    values = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32))
    kw = dict(
        n_rays=n_rays, valid=jnp.asarray(valid), group=group
    )
    got = accumulate_along_rays(
        weights, jnp.asarray(ray_indices), values,
        ends=jnp.asarray(cum.astype(np.int32)), **kw,
    )
    want = accumulate_along_rays(
        weights, jnp.asarray(ray_indices), values, **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("group_compact", [False, True])
def test_march_ray_ends_consistent(group_compact):
    """ray_ends must bracket exactly the slots carrying each ray's samples."""
    key = jax.random.PRNGKey(0)
    n_rays, cap = 32, 512
    rays_o = jnp.stack(
        [
            jnp.zeros((n_rays,)),
            jnp.zeros((n_rays,)),
            jnp.full((n_rays,), 3.0),
        ],
        axis=-1,
    )
    d = jax.random.normal(key, (n_rays, 3)) * 0.2 + jnp.array([0, 0, -1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, -1.0, 1.0)
    kw = {}
    if group_compact:
        res = 32
        from instant_nsr_pl_tpu.ops.marching import OccGridSpec
        from instant_nsr_pl_tpu.ops.contraction import ContractionType

        spec = OccGridSpec(
            resolution=res, radius=1.0, contraction_type=ContractionType.AABB
        )
        binary = jnp.ones((res**3,), bool)  # fully occupied: dilated == binary
        kw = dict(
            occ_binary=binary,
            occ_spec=spec,
            occ_dilated=binary,
            occ_stride=4,
            group_compact=True,
        )
    samples = march_rays(
        rays_o, rays_d, t_min, t_max,
        render_step_size=0.05, max_samples=64, capacity=cap, **kw,
    )
    ray_indices = np.asarray(samples.ray_indices)
    valid = np.asarray(samples.valid)
    ends = np.asarray(samples.ray_ends)
    starts = np.concatenate([[0], ends[:-1]])
    assert (ends >= starts).all()
    for r in range(n_rays):
        slots = ray_indices[valid] if False else None  # noqa: F841
        # every valid slot of ray r lies in [starts[r], ends[r])
        where_r = np.nonzero((ray_indices == r) & valid)[0]
        if len(where_r):
            assert where_r.min() >= starts[r], r
            assert where_r.max() < ends[r], r
        # no valid slot of another ray lies inside r's range
        inside = valid[int(starts[r]) : int(ends[r])]
        rin = ray_indices[int(starts[r]) : int(ends[r])]
        assert (rin[inside] == r).all(), r


# ---------------------------------------------------------------------------
# feature-major lane-native accumulate (INSR_ACC_FM path)
# ---------------------------------------------------------------------------


def _grouped_packed_case(rng, n_rays=9, k=8, cap=256, d=5):
    """Group-aligned packed buffer (the group-compacted march layout):
    every ray owns a whole number of k-blocks; ray_ends are slot offsets."""
    blocks = rng.integers(0, 4, size=(n_rays,))
    blocks[rng.integers(0, n_rays, size=2)] = 0
    cum_b = np.cumsum(blocks)
    assert cum_b[-1] * k <= cap
    ray_indices = np.full((cap,), n_rays - 1, np.int32)
    pos = 0
    for r in range(n_rays):
        n_r = int(blocks[r]) * k
        ray_indices[pos : pos + n_r] = r
        pos += n_r
    valid = np.zeros((cap,), bool)
    valid[:pos] = True
    # a few invalid straggler slots INSIDE live blocks (march tail slots)
    if pos >= k:
        valid[pos - 2 : pos] = False
    ends = (cum_b * k).astype(np.int32)
    w = rng.normal(size=(cap,)).astype(np.float32)
    vals = rng.normal(size=(cap, d)).astype(np.float32)
    return (
        jnp.asarray(w),
        jnp.asarray(vals),
        jnp.asarray(ray_indices),
        jnp.asarray(valid),
        jnp.asarray(ends),
        n_rays,
        k,
    )


def test_accumulate_fm_matches_row_major(monkeypatch):
    rng = np.random.default_rng(3)
    w, vals, ri, valid, ends, n_rays, k = _grouped_packed_case(rng)
    for values in (None, vals):
        monkeypatch.setenv("INSR_ACC_FM", "1")
        fm = accumulate_along_rays(
            w, ri, values, n_rays=n_rays, valid=valid, group=k, ends=ends
        )
        monkeypatch.delenv("INSR_ACC_FM", raising=False)
        rm = accumulate_along_rays(
            w, ri, values, n_rays=n_rays, valid=valid, group=k, ends=ends
        )
        np.testing.assert_allclose(
            np.asarray(fm), np.asarray(rm), rtol=1e-5, atol=1e-6
        )


def test_accumulate_fm_grads_match(monkeypatch):
    rng = np.random.default_rng(4)
    w, vals, ri, valid, ends, n_rays, k = _grouped_packed_case(rng)

    def loss(wx, vx):
        acc = accumulate_along_rays(
            wx, ri, vx, n_rays=n_rays, valid=valid, group=k, ends=ends
        )
        return (acc * jnp.arange(acc.size).reshape(acc.shape)).sum()

    monkeypatch.setenv("INSR_ACC_FM", "1")
    gw_fm, gv_fm = jax.grad(loss, argnums=(0, 1))(w, vals)
    monkeypatch.delenv("INSR_ACC_FM", raising=False)
    gw_rm, gv_rm = jax.grad(loss, argnums=(0, 1))(w, vals)
    np.testing.assert_allclose(
        np.asarray(gw_fm), np.asarray(gw_rm), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gv_fm), np.asarray(gv_rm), rtol=1e-5, atol=1e-6
    )
