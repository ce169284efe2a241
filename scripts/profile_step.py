"""Per-component timing of the NeRF train step at the reference workload.

Times each stage of the hot path separately (march, hash encode fwd /
fwd+bwd, MLPs, compositing, full step) on the real TPU with the
overhead-cancelling K-chain harness. Grounds PERF.md's breakdown.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

N_RAYS = 8192
CAP = 262144
S = 1024


def chain(op, K):
    @jax.jit
    def f(x, *args):
        def body(i, carry):
            x_c, acc = carry
            s = jnp.asarray(op(x_c, *args), jnp.float32).reshape(())
            # data-dependent no-op (never fires, not constant-foldable)
            x_c = x_c + (s > 1e30).astype(x_c.dtype)
            return x_c, acc + s

        _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0)))
        return acc

    return f


def timeit_rep(op, x, *args, reps=(1, 3)):
    res = {}
    for k in reps:
        f = chain(op, k)
        r = f(x, *args)
        float(jnp.asarray(r).ravel()[0])
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            r = f(x, *args)
            float(jnp.asarray(r).ravel()[0])
        res[k] = (time.perf_counter() - t0) / n
    k0, k1 = reps
    return (res[k1] - res[k0]) / (k1 - k0)


def report(name, secs):
    print(f"{name:48s} {secs*1e3:9.2f} ms")


def main():
    from bench import build_system

    system = build_system()
    state = system.init_state(seed=0)
    # settle occupancy + dynamic rays
    for _ in range(40):
        state, metrics = system.train_step(state)
    float(metrics["train/loss"])
    model = system.model
    params = state["params"]
    occ = state["occ"]

    key = jax.random.PRNGKey(1)
    rays_o = jax.random.normal(key, (N_RAYS, 3)) * 0.1 + jnp.array([0.0, 0.0, 4.0])
    rays_d = jax.random.normal(key, (N_RAYS, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True) * -1
    positions = jax.random.uniform(key, (CAP, 3), minval=-1.0, maxval=1.0)
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (CAP, 3))

    from instant_nsr_pl_tpu.ops.marching import march_rays, packed_positions
    from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect
    from instant_nsr_pl_tpu.ops.rendering import (
        accumulate_along_rays,
        render_weight_from_density,
    )
    from instant_nsr_pl_tpu.ops.hashgrid import (
        HashGridSpec,
        hashgrid_encode_fast,
        hashgrid_init,
    )

    gc = (getattr(model, 'group_compact', False) and model.grid_prune
          and model.occ_stride > 1 and CAP % model.occ_stride == 0)
    print('group_compact:', gc)

    # -- march ------------------------------------------------------------
    def op_march(ro):
        t_min, t_max = ray_aabb_intersect(ro, rays_d, -1.5, 1.5)
        s = march_rays(
            ro, rays_d, t_min, t_max,
            render_step_size=model.render_step_size,
            max_samples=S, capacity=CAP,
            occ_binary=occ["grid"].binary, occ_spec=model.occ_spec,
            occ_dilated=occ["grid"].binary_dilated, occ_stride=model.occ_stride,
            group_compact=gc, occ_bricks=occ["grid"].bricks,
        )
        return s.t_starts[0]

    report("march (probe+compact)", timeit_rep(op_march, rays_o))

    def op_march_pos(ro):
        t_min, t_max = ray_aabb_intersect(ro, rays_d, -1.5, 1.5)
        s = march_rays(
            ro, rays_d, t_min, t_max,
            render_step_size=model.render_step_size,
            max_samples=S, capacity=CAP,
            occ_binary=occ["grid"].binary, occ_spec=model.occ_spec,
            occ_dilated=occ["grid"].binary_dilated, occ_stride=model.occ_stride,
            group_compact=gc, occ_bricks=occ["grid"].bricks,
        )
        p, d, t_mid, iv = packed_positions(s, ro, rays_d)
        return p[0, 0]

    report("march + packed_positions", timeit_rep(op_march_pos, rays_o))

    # -- xyz encode (whatever the bench config selects) --------------------
    x01 = (positions + 1.5) / 3.0
    enc_cfg = system.config.model.geometry.xyz_encoding_config
    if enc_cfg["otype"] in ("HashGrid", "ProgressiveBandHashGrid"):
        spec = HashGridSpec.from_config(dict(enc_cfg))
        table = hashgrid_init(jax.random.PRNGKey(0), spec)

        def op_enc(x, tab):
            return hashgrid_encode_fast(tab, x, spec)[0, 0]

        report("hash encode fwd (fast path)", timeit_rep(op_enc, x01, table))

        def op_enc_grad(x, tab):
            def loss(t):
                return hashgrid_encode_fast(t, x, spec).sum()

            return jax.grad(loss)(tab)[0, 0]

        report(
            "hash encode fwd+bwd (fast path)", timeit_rep(op_enc_grad, x01, table)
        )
    else:
        encoding = model.geometry.encoding_with_network.encoding
        enc_params = params["geometry"]["encoding"]

        def op_enc(x, ep):
            return encoding.apply(ep, x)[0, 0]

        report(f"xyz encode fwd ({enc_cfg['otype']})",
               timeit_rep(op_enc, x01, enc_params))

        def op_enc_grad(x, ep):
            def loss(p):
                return encoding.apply(p, x).sum()

            return jax.tree.leaves(jax.grad(loss)(ep))[0].ravel()[0]

        report(f"xyz encode fwd+bwd ({enc_cfg['otype']})",
               timeit_rep(op_enc_grad, x01, enc_params))

    # -- geometry (encode + MLP) -------------------------------------------
    def op_geo(x):
        density, feat = model.geometry.apply(params["geometry"], x, step=0)
        return density[0]

    report("geometry fwd (enc+MLP)", timeit_rep(op_geo, positions))

    def op_geo_grad(x):
        def loss(p):
            density, feat = model.geometry.apply(p, x, step=0)
            return density.sum() + feat.sum()

        g = jax.grad(loss)(params["geometry"])
        return jax.tree.leaves(g)[0].ravel()[0]

    report("geometry fwd+bwd", timeit_rep(op_geo_grad, positions))

    # -- texture -----------------------------------------------------------
    feature = jnp.ones((CAP, 16), jnp.float32)

    def op_tex(f):
        return model.texture.apply(params["texture"], f, dirs, step=0)[0, 0]

    report("texture fwd (SH+MLP)", timeit_rep(op_tex, feature))

    # -- compositing ---------------------------------------------------------
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, -1.5, 1.5)
    samples = jax.jit(
        lambda ro: march_rays(
            ro, rays_d, t_min, t_max,
            render_step_size=model.render_step_size,
            max_samples=S, capacity=CAP,
            occ_binary=occ["grid"].binary, occ_spec=model.occ_spec,
            occ_dilated=occ["grid"].binary_dilated, occ_stride=model.occ_stride,
            group_compact=gc, occ_bricks=occ["grid"].bricks,
        )
    )(rays_o)
    density_v = jnp.abs(jax.random.normal(key, (CAP,))) * 10
    rgb_v = jax.random.uniform(key, (CAP, 3))

    def op_comp(d):
        w = render_weight_from_density(
            samples.t_starts, samples.t_ends, d, samples.ray_indices, samples.valid
        )
        o = accumulate_along_rays(
            w, samples.ray_indices, None, n_rays=N_RAYS, valid=samples.valid
        )
        c = accumulate_along_rays(
            w, samples.ray_indices, rgb_v, n_rays=N_RAYS, valid=samples.valid
        )
        return c[0, 0] + o[0]

    report("compositing fwd", timeit_rep(op_comp, density_v))

    def op_comp_grad(d):
        def loss(dd):
            w = render_weight_from_density(
                samples.t_starts, samples.t_ends, dd, samples.ray_indices,
                samples.valid,
            )
            c = accumulate_along_rays(
                w, samples.ray_indices, rgb_v, n_rays=N_RAYS, valid=samples.valid
            )
            return c.sum()

        return jax.grad(loss)(d)[0]

    report("compositing fwd+bwd", timeit_rep(op_comp_grad, density_v))

    # -- full model fwd / train step -----------------------------------------
    def op_fwd(ro):
        out = model.forward(
            params, occ, ro, rays_d,
            background_color=jnp.ones((3,)), capacity=CAP,
            rng=jax.random.PRNGKey(0), step=0, randomized=False, train=True,
        )
        return out["comp_rgb"][0, 0]

    report("model fwd total", timeit_rep(op_fwd, rays_o))

    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state, metrics = system.train_step(state)
    float(metrics["train/loss"])
    report("full train step (avg, incl occ amort)", (time.perf_counter() - t0) / n)


if __name__ == "__main__":
    main()
