"""Group-granular march compaction must be sample-for-sample equivalent to
the per-sample strided path when capacity is ample (pruning is already
group-granular there), and conservative under truncation."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.ops.marching import (
    OccGridSpec,
    _dilate_binary,
    march_rays,
)
from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect


def _scene(key, n_rays=32):
    spec = OccGridSpec(resolution=32, radius=1.0)
    binary = jax.random.bernoulli(key, 0.2, (32**3,))
    dilated = _dilate_binary(binary, 32)
    rays_o = jnp.zeros((n_rays, 3)).at[:, 2].set(-2.5)
    d = jax.random.normal(key, (n_rays, 3)) * 0.15 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0, t1 = ray_aabb_intersect(rays_o, rays_d, -1.0, 1.0)
    return spec, binary, dilated, rays_o, rays_d, t0, t1


def _live_set(s):
    return {
        (int(r), round(float(t), 5))
        for r, t, v in zip(
            np.asarray(s.ray_indices), np.asarray(s.t_starts), np.asarray(s.valid)
        )
        if v
    }


def test_group_compact_matches_strided():
    spec, binary, dilated, rays_o, rays_d, t0, t1 = _scene(jax.random.PRNGKey(0))
    kw = dict(
        render_step_size=0.015, max_samples=256, capacity=8192,
        occ_spec=spec, occ_binary=binary, occ_dilated=dilated, occ_stride=4,
    )
    ref = march_rays(rays_o, rays_d, t0, t1, **kw)
    grp = march_rays(rays_o, rays_d, t0, t1, group_compact=True, **kw)
    assert _live_set(ref) == _live_set(grp)
    assert int(ref.num_valid) == int(grp.num_valid)
    np.testing.assert_array_equal(np.asarray(ref.ray_kept), np.asarray(grp.ray_kept))


def test_group_compact_stratified_matches():
    spec, binary, dilated, rays_o, rays_d, t0, t1 = _scene(jax.random.PRNGKey(3))
    kw = dict(
        render_step_size=0.015, max_samples=256, capacity=8192,
        occ_spec=spec, occ_binary=binary, occ_dilated=dilated, occ_stride=4,
        stratified=True, rng=jax.random.PRNGKey(7),
    )
    ref = march_rays(rays_o, rays_d, t0, t1, **kw)
    grp = march_rays(rays_o, rays_d, t0, t1, group_compact=True, **kw)
    assert _live_set(ref) == _live_set(grp)


def test_group_compact_truncation_is_group_aligned():
    """With a tight capacity, kept rays must be complete (every live sample
    of a kept ray present) and the buffer must never overflow."""
    spec, binary, dilated, rays_o, rays_d, t0, t1 = _scene(jax.random.PRNGKey(1))
    kw = dict(
        render_step_size=0.015, max_samples=256, capacity=512,
        occ_spec=spec, occ_binary=binary, occ_dilated=dilated, occ_stride=4,
    )
    ample = march_rays(
        rays_o, rays_d, t0, t1, group_compact=True,
        **{**kw, "capacity": 8192},
    )
    tight = march_rays(rays_o, rays_d, t0, t1, group_compact=True, **kw)
    full = _live_set(ample)
    got = _live_set(tight)
    assert got <= full
    kept = np.asarray(tight.ray_kept)
    for r in np.unique([k[0] for k in full]):
        if kept[r]:
            missing = {k for k in full if k[0] == r} - got
            assert not missing, (r, missing)


def test_sorted_by_ray():
    """Packed output must stay ray-sorted (compositing scans require it)."""
    spec, binary, dilated, rays_o, rays_d, t0, t1 = _scene(jax.random.PRNGKey(2))
    s = march_rays(
        rays_o, rays_d, t0, t1,
        render_step_size=0.015, max_samples=256, capacity=4096,
        occ_spec=spec, occ_binary=binary, occ_dilated=dilated, occ_stride=4,
        group_compact=True,
    )
    ri = np.asarray(s.ray_indices)[np.asarray(s.valid)]
    assert (np.diff(ri) >= 0).all()

def test_brick_pack_probe_matches_direct():
    """probe_bricks_coords must be bit-identical to binary[flat] for any
    run whose cells span <= 8 per axis."""
    from instant_nsr_pl_tpu.ops.marching import pack_bricks, probe_bricks_coords

    res = 32
    key = jax.random.PRNGKey(0)
    binary = jax.random.bernoulli(key, 0.3, (res**3,))
    bricks = pack_bricks(binary, res)
    ks = jax.random.split(key, 6)
    R, G = 64, 32
    cells = []
    for a in range(3):
        base = jax.random.randint(ks[a], (R, G // 4, 1), 0, res - 7, jnp.int32)
        off = jax.random.randint(ks[3 + a], (R, G // 4, 4), 0, 8, jnp.int32)
        cells.append(jnp.clip(base + off, 0, res - 1).reshape(R, G))
    cx, cy, cz = cells
    got = probe_bricks_coords(bricks, cx, cy, cz, res)
    ref = binary[(cx + cy * res + cz * res * res).reshape(-1)].reshape(R, G)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_brick_probe_lanes_matches_coords():
    """probe_bricks_lanes (the (R, SG) lane-native formulation the fast
    march path uses) must be bit-identical to probe_bricks_coords."""
    from instant_nsr_pl_tpu.ops.marching import (
        pack_bricks,
        probe_bricks_coords,
        probe_bricks_lanes,
    )

    res = 32
    key = jax.random.PRNGKey(7)
    binary = jax.random.bernoulli(key, 0.3, (res**3,))
    bricks = pack_bricks(binary, res)
    ks = jax.random.split(key, 6)
    R, G = 64, 32
    cells = []
    for a in range(3):
        base = jax.random.randint(ks[a], (R, G // 4, 1), 0, res - 7, jnp.int32)
        off = jax.random.randint(ks[3 + a], (R, G // 4, 4), 0, 8, jnp.int32)
        cells.append(jnp.clip(base + off, 0, res - 1).reshape(R, G))
    cx, cy, cz = cells
    got = probe_bricks_lanes(bricks, cx, cy, cz, res)
    ref = probe_bricks_coords(bricks, cx, cy, cz, res)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_brick_march_matches_plain():
    """march_rays with occ_bricks must produce EXACTLY the same packed
    samples as without (the brick probe is a gather-batching trick, not an
    approximation)."""
    from instant_nsr_pl_tpu.ops.marching import pack_bricks

    for seed in (0, 4):
        spec, binary, dilated, rays_o, rays_d, t0, t1 = _scene(
            jax.random.PRNGKey(seed)
        )
        bricks = pack_bricks(dilated, spec.resolution)
        kw = dict(
            render_step_size=0.015, max_samples=256, capacity=8192,
            occ_spec=spec, occ_binary=binary, occ_dilated=dilated,
            occ_stride=4, group_compact=True,
        )
        ref = march_rays(rays_o, rays_d, t0, t1, **kw)
        got = march_rays(rays_o, rays_d, t0, t1, occ_bricks=bricks, **kw)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_occupancy_state_carries_bricks():
    """Grid updates must keep the bricks field in sync with the dilated
    binary (probing bricks == probing binary_dilated)."""
    from instant_nsr_pl_tpu.ops.marching import (
        OccGridSpec, occupancy_grid_init, occupancy_grid_update,
        pack_bricks,
    )

    spec = OccGridSpec(resolution=16, radius=1.0)
    state = occupancy_grid_init(spec)
    state = occupancy_grid_update(
        state, spec, jax.random.PRNGKey(0),
        lambda w: (jnp.linalg.norm(w, axis=-1) < 0.5).astype(jnp.float32),
        warmup=True,
    )
    assert bool(state.binary.any())
    np.testing.assert_array_equal(
        np.asarray(state.bricks),
        np.asarray(pack_bricks(state.binary_dilated, 16)),
    )


def test_slab_update_full_coverage():
    """8 slab-phase updates must refresh every cell (EMA == fresh eval when
    starting from zero), matching what a full warmup pass would produce."""
    from instant_nsr_pl_tpu.ops.marching import (
        OccGridSpec, occupancy_grid_init, occupancy_grid_update,
    )

    spec = OccGridSpec(resolution=16, radius=1.0)
    fn = lambda w: (jnp.linalg.norm(w, axis=-1) < 0.6).astype(jnp.float32)
    state = occupancy_grid_init(spec)
    for phase in range(8):
        state = occupancy_grid_update(
            state, spec, jax.random.PRNGKey(phase), fn, phase=phase
        )
    ref = occupancy_grid_update(
        occupancy_grid_init(spec), spec, jax.random.PRNGKey(99), fn, warmup=True
    )
    # same cells live (jitter differs per call, but the field is radial and
    # cell-resolution coarse, so the binarization agrees except at the
    # boundary shell — require > 95% agreement and a nonempty interior)
    a = np.asarray(state.binary)
    b = np.asarray(ref.binary)
    assert a.any() and b.any()
    assert (a == b).mean() > 0.95


def test_word_pipeline_matches_plain_twins():
    """Packed-bit dilate + brick assembly must be bit-exact vs the plain
    reduce_window / bool-cube implementations."""
    from instant_nsr_pl_tpu.ops.marching import (
        OccGridSpec, _bricks_from_words, _dilate_binary, _dilate_words,
        _pack_words, _postprocess_binary, _unpack_words, pack_bricks,
    )

    for res, p in ((32, 0.3), (64, 0.08)):
        binary = jax.random.bernoulli(jax.random.PRNGKey(res), p, (res**3,))
        W = _pack_words(binary, res)
        np.testing.assert_array_equal(
            np.asarray(_unpack_words(W, res)), np.asarray(binary)
        )
        d_ref = _dilate_binary(binary, res)
        Wd = _dilate_words(W)
        np.testing.assert_array_equal(
            np.asarray(_unpack_words(Wd, res)), np.asarray(d_ref)
        )
        np.testing.assert_array_equal(
            np.asarray(_bricks_from_words(Wd, res)),
            np.asarray(pack_bricks(d_ref, res)),
        )
        spec = OccGridSpec(resolution=res, radius=1.0)
        dil2, br2 = _postprocess_binary(binary, spec)
        np.testing.assert_array_equal(np.asarray(dil2), np.asarray(d_ref))
        np.testing.assert_array_equal(
            np.asarray(br2), np.asarray(pack_bricks(d_ref, res))
        )


def test_select_groups_two_level_matches_single_sort():
    """The two-level (super-group -> group) compaction selection must
    reproduce the single-sort output bit-for-bit, at every fill level and
    truncation regime (round-5 perf: fewer sorted keys, PERF.md)."""
    from instant_nsr_pl_tpu.ops.marching import _select_groups

    def single_sort(gvalid, R, sg, cap_g):
        src = jnp.arange(R * sg, dtype=jnp.int32)
        keys = jnp.where(gvalid.reshape(-1), src, jnp.int32(R * sg))
        (sorted_keys,) = jax.lax.sort((keys,), num_keys=1)
        return sorted_keys[:cap_g]

    for seed, R, sg, cap_g, p in (
        (0, 64, 32, 128, 0.05),   # sparse, ample capacity
        (1, 64, 32, 128, 0.6),    # dense -> truncation
        (2, 64, 32, 20480 // 32, 1.0),  # fully live, cap_g > R*sgq -> fallback
        (3, 64, 32, 64, 0.0),     # empty
        (4, 16, 8, 4096, 0.3),    # cap_g >= R*sgq -> single-sort branch
        (5, 64, 30, 128, 0.3),    # sg not divisible by Q -> fallback
        (6, 64, 32, 256, 1.0),    # fully live THROUGH the two-level path
        (7, 64, 32, 512, 0.9),    # dense truncation through the two-level path
    ):
        gvalid = jax.random.bernoulli(
            jax.random.PRNGKey(seed), p, (R, sg)
        )
        got = _select_groups(gvalid, R, sg, cap_g)
        want = single_sort(gvalid, R, sg, cap_g)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"seed={seed}"
        )
