"""Compositing + marching ops vs naive per-ray reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.ops.rendering import (
    accumulate_along_rays,
    distortion_loss,
    exclusive_cumprod_segments,
    render_weight_from_alpha,
    render_weight_from_density,
    segmented_cumsum,
)
from instant_nsr_pl_tpu.ops.marching import (
    OccGridSpec,
    PackedSamples,
    march_rays,
    occupancy_grid_init,
    occupancy_grid_update,
    occupancy_lookup,
    packed_positions,
)
from instant_nsr_pl_tpu.ops.contraction import ContractionType
from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect


def _random_packed(key, n_rays=6, cap=40):
    """Build a random valid packed layout (sorted by ray, padding at tail)."""
    k1, k2 = jax.random.split(key)
    counts = np.asarray(jax.random.randint(k1, (n_rays,), 0, 9))
    ray_indices, total = [], 0
    for r, c in enumerate(counts):
        ray_indices += [r] * int(c)
    total = len(ray_indices)
    assert total <= cap
    ray_indices = np.array(ray_indices + [n_rays - 1] * (cap - total), np.int32)
    valid = np.arange(cap) < total
    vals = np.asarray(jax.random.uniform(k2, (cap,)))
    return jnp.asarray(ray_indices), jnp.asarray(valid), jnp.asarray(vals), counts


def test_segmented_cumsum():
    ri, valid, vals, counts = _random_packed(jax.random.PRNGKey(0))
    incl = np.asarray(segmented_cumsum(vals, ri, valid))
    excl = np.asarray(segmented_cumsum(vals, ri, valid, exclusive=True))
    v = np.asarray(vals)
    i = 0
    for c in counts:
        run_incl = np.cumsum(v[i : i + c])
        np.testing.assert_allclose(incl[i : i + c], run_incl, rtol=1e-6)
        np.testing.assert_allclose(
            excl[i : i + c], run_incl - v[i : i + c], rtol=1e-6, atol=1e-7
        )
        i += c


def test_transmittance_vs_naive_cumprod():
    ri, valid, alpha, counts = _random_packed(jax.random.PRNGKey(1))
    alpha = alpha * 0.9
    T = np.asarray(exclusive_cumprod_segments(alpha, ri, valid))
    a = np.asarray(alpha)
    i = 0
    for c in counts:
        expect = np.cumprod(np.concatenate([[1.0], 1 - a[i : i + c]]))[:-1]
        np.testing.assert_allclose(T[i : i + c], expect, rtol=1e-5)
        i += c


def test_render_weight_from_density_matches_formula():
    ri, valid, sig, counts = _random_packed(jax.random.PRNGKey(2))
    sigma = sig * 20.0
    t_starts = jnp.arange(ri.shape[0], dtype=jnp.float32) * 0.01
    t_ends = t_starts + 0.01
    w = np.asarray(render_weight_from_density(t_starts, t_ends, sigma, ri, valid))
    a = 1 - np.exp(-np.asarray(sigma) * 0.01)
    i = 0
    for c in counts:
        T = np.cumprod(np.concatenate([[1.0], 1 - a[i : i + c]]))[:-1]
        np.testing.assert_allclose(w[i : i + c], a[i : i + c] * T, rtol=2e-4, atol=1e-6)
        i += c
    assert (w[~np.asarray(valid)] == 0).all()


def test_render_weights_sum_to_opacity_leq_one():
    ri, valid, alpha, _ = _random_packed(jax.random.PRNGKey(3))
    w = render_weight_from_alpha(alpha, ri, valid)
    opac = np.asarray(accumulate_along_rays(w, ri, None, n_rays=6, valid=valid))
    assert (opac <= 1.0 + 1e-5).all() and (opac >= 0).all()


def test_accumulate_along_rays_values():
    ri, valid, w, counts = _random_packed(jax.random.PRNGKey(4))
    vals = jnp.stack([jnp.ones_like(w), 2 * jnp.ones_like(w), w], -1)
    acc = np.asarray(accumulate_along_rays(w, ri, vals, n_rays=6, valid=valid))
    wn = np.where(np.asarray(valid), np.asarray(w), 0)
    i = 0
    for r, c in enumerate(counts):
        np.testing.assert_allclose(acc[r, 0], wn[i : i + c].sum(), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            acc[r, 2], (wn[i : i + c] ** 2).sum(), rtol=1e-5, atol=1e-7
        )
        i += c


def test_distortion_loss_vs_quadratic_reference():
    ri, valid, w, counts = _random_packed(jax.random.PRNGKey(5))
    # midpoints must be ascending within each ray (as real marching produces)
    steps = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(6), w.shape, minval=0.01, maxval=0.2)
    )
    mid_np = np.zeros_like(steps)
    i = 0
    for c in counts:
        mid_np[i : i + c] = 0.1 + np.cumsum(steps[i : i + c])
        i += c
    mid = jnp.asarray(mid_np)
    interval = jnp.full_like(w, 0.01)
    got = float(distortion_loss(w, mid, interval, ri, valid, n_rays=6))
    # naive O(n^2) per-ray double sum
    wn, mn = np.asarray(w), np.asarray(mid)
    total, i = 0.0, 0
    for c in counts:
        ww, mm = wn[i : i + c], mn[i : i + c]
        bi = np.abs(mm[:, None] - mm[None, :]) * (ww[:, None] * ww[None, :])
        total += bi.sum() + (1 / 3) * (ww**2 * 0.01).sum()
        i += c
    np.testing.assert_allclose(got, total / 6, rtol=1e-4)


def test_distortion_loss_differentiable():
    ri, valid, w, _ = _random_packed(jax.random.PRNGKey(7))
    mid = jnp.abs(w) + 0.1
    interval = jnp.full_like(w, 0.01)
    g = jax.grad(
        lambda ww: distortion_loss(ww, mid, interval, ri, valid, n_rays=6)
    )(w)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# marching
# ---------------------------------------------------------------------------


def test_march_rays_uniform_no_grid():
    rays_o = jnp.array([[0.0, 0.0, -3.0], [0.0, 5.0, 0.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])  # 2nd ray misses
    t0, t1 = ray_aabb_intersect(rays_o, rays_d, -1.5, 1.5)
    out = march_rays(
        rays_o, rays_d, t0, t1,
        render_step_size=0.5, max_samples=8, capacity=16,
    )
    # ray 0: [1.5, 4.5] range, step .5 -> midpoints 1.75..4.25 -> 6 samples
    assert int(out.num_valid) == 6
    v = np.asarray(out.valid)
    assert v[:6].all() and not v[6:].any()
    np.testing.assert_allclose(np.asarray(out.ray_indices)[:6], 0)
    np.testing.assert_allclose(
        np.asarray(out.t_starts)[:6], 1.5 + 0.5 * np.arange(6), atol=1e-6
    )
    pos, dirs, t_mid, dt = packed_positions(out, rays_o, rays_d)
    np.testing.assert_allclose(np.asarray(dt)[:6], 0.5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pos)[0], [0, 0, -3 + 1.75], atol=1e-6
    )


def test_march_rays_stratified_jitter_and_capacity_clip():
    rays_o = jnp.zeros((4, 3)).at[:, 2].set(-3.0)
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    t0, t1 = ray_aabb_intersect(rays_o, rays_d, -1.5, 1.5)
    out = march_rays(
        rays_o, rays_d, t0, t1,
        render_step_size=0.1, max_samples=64, capacity=32,  # 4*~30 > 32
        stratified=True, rng=jax.random.PRNGKey(0),
    )
    assert out.valid.all()  # buffer saturated
    # num_valid reports the PRE-truncation live count so callers can see
    # overflow; ray_kept flags rays whose samples all fit
    assert int(out.num_valid) > 32
    kept = np.asarray(out.ray_kept)
    assert kept[0] and not kept[-1]  # first ray fits, later rays truncated
    # jitter shifts the first sample start into (1.5, 1.6)
    assert 1.5 < float(out.t_starts[0]) < 1.6
    # sorted by ray
    ri = np.asarray(out.ray_indices)
    assert (np.diff(ri) >= 0).all()


def test_march_cone_schedule_monotone_geometric():
    from instant_nsr_pl_tpu.ops.marching import _t_schedule

    t = np.asarray(_t_schedule(jnp.array([0.1]), 0.01, 0.0273, 128))[0]
    dt = np.diff(t)
    assert (dt > 0).all()
    # early steps linear at s
    np.testing.assert_allclose(dt[0], 0.01, rtol=1e-5)
    # late steps geometric: dt ~= t * c
    np.testing.assert_allclose(dt[-1], t[-2] * 0.0273, rtol=1e-3)


def test_occupancy_grid_update_and_pruning():
    spec = OccGridSpec(resolution=16, radius=1.5, contraction_type=ContractionType.AABB)
    state = occupancy_grid_init(spec)

    def occ_eval_fn(x):
        # occupied only inside a r=0.5 ball
        return (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)

    state = occupancy_grid_update(
        state, spec, jax.random.PRNGKey(0), occ_eval_fn, occ_thre=0.01, warmup=True
    )
    # center cell occupied, corner cell free
    center = jnp.array([[0.05, 0.05, 0.05]])
    corner = jnp.array([[1.4, 1.4, 1.4]])
    assert bool(occupancy_lookup(state.binary, center, spec)[0])
    assert not bool(occupancy_lookup(state.binary, corner, spec)[0])
    # outside the domain is never occupied
    outside = jnp.array([[2.0, 0.0, 0.0]])
    assert not bool(occupancy_lookup(state.binary, outside, spec)[0])

    # non-warmup update keeps shapes and stays finite
    state2 = occupancy_grid_update(
        state, spec, jax.random.PRNGKey(1), occ_eval_fn, occ_thre=0.01, warmup=False
    )
    assert state2.occs.shape == state.occs.shape
    assert bool(occupancy_lookup(state2.binary, center, spec)[0])


def test_march_rays_with_occupancy_pruning():
    spec = OccGridSpec(resolution=32, radius=1.5)
    state = occupancy_grid_init(spec)

    def occ_eval_fn(x):
        return (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)

    state = occupancy_grid_update(
        state, spec, jax.random.PRNGKey(0), occ_eval_fn, warmup=True
    )
    rays_o = jnp.array([[0.0, 0.0, -3.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    t0, t1 = ray_aabb_intersect(rays_o, rays_d, -1.5, 1.5)
    out = march_rays(
        rays_o, rays_d, t0, t1,
        render_step_size=0.05, max_samples=64, capacity=64,
        occ_binary=state.binary, occ_spec=spec,
    )
    pos, _, _, _ = packed_positions(out, rays_o, rays_d)
    pos = np.asarray(pos)[np.asarray(out.valid)]
    # all surviving samples are near the occupied ball (cell-size slack)
    assert (np.linalg.norm(pos, axis=-1) < 0.5 + 0.1).all()
    assert int(out.num_valid) > 0


def test_march_rays_jit_static_shapes():
    f = jax.jit(
        lambda o, d, t0, t1: march_rays(
            o, d, t0, t1, render_step_size=0.1, max_samples=32, capacity=64
        )
    )
    o = jnp.zeros((8, 3)).at[:, 2].set(-3.0)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    t0, t1 = ray_aabb_intersect(o, d, -1.5, 1.5)
    out = f(o, d, t0, t1)
    assert out.t_starts.shape == (64,)


def _random_grouped_packed(key, n_rays=7, n_groups=24, k=4):
    """Packed buffer in the group-compacted layout: each aligned k-block is
    single-ray; blocks of a ray are contiguous; each block has a valid
    prefix (possibly empty only for tail padding blocks)."""
    k1, k2 = jax.random.split(key)
    blocks_per_ray = np.asarray(jax.random.randint(k1, (n_rays,), 0, 4))
    ray_ids, live = [], []
    for r, b in enumerate(blocks_per_ray):
        for j in range(int(b)):
            if len(ray_ids) == n_groups:
                break
            ray_ids.append(r)
            # valid prefix of length 1..k (last block of a ray may be short)
            live.append(k if j + 1 < int(b) else 1 + (r + j) % k)
    while len(ray_ids) < n_groups:
        ray_ids.append(n_rays - 1)  # padding blocks
        live.append(0)
    cap = n_groups * k
    ray_indices = np.repeat(np.array(ray_ids, np.int32), k)
    valid = np.zeros((n_groups, k), bool)
    for g, m in enumerate(live):
        valid[g, :m] = True
    vals = np.asarray(jax.random.uniform(k2, (cap,)))
    return (
        jnp.asarray(ray_indices),
        jnp.asarray(valid.reshape(-1)),
        jnp.asarray(vals),
    )


def test_grouped_segmented_cumsum_matches_flat():
    k = 4
    ri, valid, x = _random_grouped_packed(jax.random.PRNGKey(0), k=k)
    for exclusive in (False, True):
        ref = segmented_cumsum(x, ri, valid, exclusive=exclusive)
        got = segmented_cumsum(x, ri, valid, exclusive=exclusive, group=k)
        np.testing.assert_allclose(
            np.asarray(got)[np.asarray(valid)],
            np.asarray(ref)[np.asarray(valid)],
            rtol=1e-6, atol=1e-6,
        )


def test_grouped_render_weights_and_accumulate_match_flat():
    k = 4
    key = jax.random.PRNGKey(1)
    ri, valid, x = _random_grouped_packed(key, k=k)
    cap = x.shape[0]
    t_starts = jnp.arange(cap, dtype=jnp.float32) * 0.01
    t_ends = t_starts + 0.01
    sigma = x * 30.0
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (cap, 3))
    n_rays = 7

    w_ref = render_weight_from_density(t_starts, t_ends, sigma, ri, valid)
    w_grp = render_weight_from_density(
        t_starts, t_ends, sigma, ri, valid, group=k
    )
    np.testing.assert_allclose(
        np.asarray(w_grp)[np.asarray(valid)],
        np.asarray(w_ref)[np.asarray(valid)],
        rtol=1e-6, atol=1e-7,
    )
    for values in (None, rgb):
        a_ref = accumulate_along_rays(
            w_ref, ri, values, n_rays=n_rays, valid=valid
        )
        a_grp = accumulate_along_rays(
            w_grp, ri, values, n_rays=n_rays, valid=valid, group=k
        )
        np.testing.assert_allclose(
            np.asarray(a_grp), np.asarray(a_ref), rtol=1e-6, atol=1e-7
        )

    w_alpha_ref = render_weight_from_alpha(x * 0.5, ri, valid)
    w_alpha_grp = render_weight_from_alpha(x * 0.5, ri, valid, group=k)
    np.testing.assert_allclose(
        np.asarray(w_alpha_grp)[np.asarray(valid)],
        np.asarray(w_alpha_ref)[np.asarray(valid)],
        rtol=1e-6, atol=1e-7,
    )


def test_grouped_distortion_loss_matches_flat():
    k = 4
    ri, valid, x = _random_grouped_packed(jax.random.PRNGKey(3), k=k)
    cap = x.shape[0]
    mid = jnp.arange(cap, dtype=jnp.float32) * 0.01 + 0.005
    iv = jnp.full((cap,), 0.01)
    ref = distortion_loss(x, mid, iv, ri, valid, n_rays=7)
    got = distortion_loss(x, mid, iv, ri, valid, n_rays=7, group=k)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_grouped_weights_gradients_match_flat():
    k = 4
    ri, valid, x = _random_grouped_packed(jax.random.PRNGKey(4), k=k)
    cap = x.shape[0]
    t_starts = jnp.arange(cap, dtype=jnp.float32) * 0.01
    t_ends = t_starts + 0.01
    rgb = jax.random.uniform(jax.random.PRNGKey(5), (cap, 3))

    def loss(sigma, group):
        w = render_weight_from_density(
            t_starts, t_ends, sigma, ri, valid, group=group
        )
        c = accumulate_along_rays(w, ri, rgb, n_rays=7, valid=valid, group=group)
        return (c**2).sum()

    g_ref = jax.grad(lambda s: loss(s, 1))(x * 30.0)
    g_grp = jax.grad(lambda s: loss(s, k))(x * 30.0)
    np.testing.assert_allclose(
        np.asarray(g_grp)[np.asarray(valid)],
        np.asarray(g_ref)[np.asarray(valid)],
        rtol=1e-5, atol=1e-6,
    )
