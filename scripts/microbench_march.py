"""Micro-decomposition of the march at the bench workload: probe gather,
group-key sort, schedule arithmetic — to decide where the next march
optimization goes (PERF.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

R, S, K = 8192, 1024, 8
SG = S // K
CAP = 262144


def chain(op, k):
    @jax.jit
    def f(x, *args):
        def body(i, carry):
            x_c, acc = carry
            s = jnp.asarray(op(x_c, *args), jnp.float32).reshape(())
            x_c = x_c + (s > 1e30).astype(x_c.dtype)
            return x_c, acc + s

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    return f


def timeit_rep(op, x, *args, reps=(1, 4)):
    res = {}
    for k in reps:
        f = chain(op, k)
        r = f(x, *args)
        float(jnp.asarray(r).ravel()[0])
        t0 = time.perf_counter()
        n = 4
        for _ in range(n):
            r = f(x, *args)
            float(jnp.asarray(r).ravel()[0])
        res[k] = (time.perf_counter() - t0) / n
    k0, k1 = reps
    return (res[k1] - res[k0]) / (k1 - k0)


def report(name, secs):
    print(f"{name:44s} {secs*1e3:9.3f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    binary = jax.random.bernoulli(key, 0.05, (128**3,))
    flat_idx = jax.random.randint(key, (R, SG), 0, 128**3, dtype=jnp.int32)

    # probe gather alone (sum forces all rows)
    report(
        "probe gather 1M bool rows",
        timeit_rep(lambda i: binary[i].sum(), flat_idx),
    )

    # group-key sort alone
    gvalid = jax.random.bernoulli(jax.random.PRNGKey(1), 0.031, (R * SG,))

    def op_sort(gv):
        src = jnp.arange(R * SG, dtype=jnp.int32)
        keys = jnp.where(gv, src, jnp.int32(R * SG))
        (sorted_keys,) = jax.lax.sort((keys,), num_keys=1)
        return sorted_keys[: CAP // K].sum()

    report("group-key sort 1M int32 + slice", timeit_rep(op_sort, gvalid))

    # contraction + cell-index arithmetic at probe resolution
    t_c = jax.random.uniform(key, (R, SG), minval=0.1, maxval=5.0)
    ro = jax.random.normal(key, (R, 3))
    rd = jax.random.normal(jax.random.PRNGKey(2), (R, 3))

    def op_coords(tc):
        px = ro[:, 0:1] + rd[:, 0:1] * tc
        py = ro[:, 1:2] + rd[:, 1:2] * tc
        pz = ro[:, 2:3] + rd[:, 2:3] * tc
        res = 128
        ux = jnp.clip((px + 1.5) / 3.0, 0.0, 1.0)
        uy = jnp.clip((py + 1.5) / 3.0, 0.0, 1.0)
        uz = jnp.clip((pz + 1.5) / 3.0, 0.0, 1.0)
        cx = jnp.clip(jnp.floor(ux * res).astype(jnp.int32), 0, res - 1)
        cy = jnp.clip(jnp.floor(uy * res).astype(jnp.int32), 0, res - 1)
        cz = jnp.clip(jnp.floor(uz * res).astype(jnp.int32), 0, res - 1)
        return (cx + cy * res + cz * res * res).sum()

    report("probe coord arithmetic (R,SG)", timeit_rep(op_coords, t_c))

    # full march as the model calls it
    from instant_nsr_pl_tpu.ops.marching import (
        OccGridSpec,
        _dilate_binary,
        march_rays,
    )
    from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect

    spec = OccGridSpec(resolution=128, radius=1.5)
    dil = _dilate_binary(binary, 128)
    rays_o = jnp.zeros((R, 3)).at[:, 2].set(-4.0)
    d = jax.random.normal(key, (R, 3)) * 0.15 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t0v, t1v = ray_aabb_intersect(rays_o, rays_d, -1.5, 1.5)
    step = 3.0 * jnp.sqrt(3.0) / S

    def op_march(ro, gc):
        s = march_rays(
            ro, rays_d, t0v, t1v,
            render_step_size=float(step), max_samples=S, capacity=CAP,
            occ_binary=binary, occ_spec=spec, occ_dilated=dil, occ_stride=K,
            group_compact=gc,
        )
        return s.t_starts.sum() + s.ray_indices.sum()

    report(
        "march full (group_compact)",
        timeit_rep(lambda ro: op_march(ro, True), rays_o),
    )
    report(
        "march full (per-sample sort)",
        timeit_rep(lambda ro: op_march(ro, False), rays_o),
    )


if __name__ == "__main__":
    main()
