"""Benchmark sort-based (scatter-free) hash-table gradient candidates.

The table gradient is a segment-sum of M weighted cotangents into T rows.
Round-1 used one-hot matmuls (~180 ms at the reference workload). XLA sort
measures at ~0.4-0.6 ns/elt on v5e, which enables fully-vectorized
sort-based formulations with no scatter at all:

  A2 (two-sort sentinel): append one zero-valued sentinel per table row,
     sort by (key, sentinel-last), inclusive-cumsum the values; the cumsum
     at sentinel t = sum of updates with idx <= t. A second sort brings
     sentinels to the front in t order; diff gives the dense gradient.

  A1 (sort + boundary gather): sort updates, cumsum, gather cumsum at the
     last position of each row's run (found via searchsorted).

Also measures the forward-gather alternatives for reference.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit_rep(make_rep, *args, reps=(1, 3)):
    results = {}
    for k in reps:
        f = make_rep(k)
        r = f(*args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            r = f(*args)
            float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        results[k] = (time.perf_counter() - t0) / n
    k0, k1 = reps
    return (results[k1] - results[k0]) / (k1 - k0)


def dep(ix, s):
    return ix + (s > 1e30).astype(ix.dtype)


def chain(op, K):
    @jax.jit
    def f(ix, *args):
        def body(i, carry):
            ix_c, acc = carry
            s = op(ix_c, *args)
            return dep(ix_c, s), acc + s

        _, acc = jax.lax.fori_loop(0, K, body, (ix, jnp.float32(0)))
        return acc

    return f


def report(name, secs, n_ops, unit="upd"):
    print(f"{name:58s} {secs*1e3:9.3f} ms   {secs/n_ops*1e9:8.3f} ns/{unit}")


def grad_two_sort(idx, wg, T):
    """A2: scatter-free dense segment-sum via two sorts + cumsum."""
    M = idx.shape[0]
    key1 = idx * 2  # updates first at equal row
    sent_key = jnp.arange(T, dtype=idx.dtype) * 2 + 1
    keys = jnp.concatenate([key1, sent_key])
    v = jnp.concatenate([wg, jnp.zeros((T, wg.shape[1]), wg.dtype)])
    sk, s0, s1 = jax.lax.sort((keys, v[:, 0], v[:, 1]), num_keys=1)
    c0 = jnp.cumsum(s0)
    c1 = jnp.cumsum(s1)
    # second sort: sentinels (odd keys) to the front in t order
    big = jnp.int32(2 * T + 2)
    key2 = jnp.where(sk % 2 == 1, sk // 2, big)
    _, g0, g1 = jax.lax.sort((key2, c0, c1), num_keys=1)
    g0 = g0[:T]
    g1 = g1[:T]
    g0 = jnp.diff(g0, prepend=jnp.zeros((1,), g0.dtype))
    g1 = jnp.diff(g1, prepend=jnp.zeros((1,), g1.dtype))
    return jnp.stack([g0, g1], axis=1)


def grad_sort_searchsorted(idx, wg, T):
    """A1: sort + cumsum + searchsorted boundary gather."""
    sk, s0, s1 = jax.lax.sort((idx, wg[:, 0], wg[:, 1]), num_keys=1)
    c0 = jnp.cumsum(s0)
    c1 = jnp.cumsum(s1)
    # hi[t] = first position with key > t  (cumsum up to hi-1 covers <= t)
    hi = jnp.searchsorted(sk, jnp.arange(T, dtype=idx.dtype), side="right")
    z0 = jnp.concatenate([jnp.zeros((1,), c0.dtype), c0])
    z1 = jnp.concatenate([jnp.zeros((1,), c1.dtype), c1])
    e0 = jnp.take(z0, hi)
    e1 = jnp.take(z1, hi)
    g0 = jnp.diff(e0, prepend=jnp.zeros((1,), e0.dtype))
    g1 = jnp.diff(e1, prepend=jnp.zeros((1,), e1.dtype))
    return jnp.stack([g0, g1], axis=1)


def fwd_sorted_scan(idx, table):
    """F3: forward gather via sort + propagate-scan + unsort-sort."""
    M = idx.shape[0]
    T = table.shape[0]
    F = table.shape[1]
    # stream: table rows (sources, first at equal key) then requests
    key_src = jnp.arange(T, dtype=idx.dtype) * 2
    key_req = idx * 2 + 1
    keys = jnp.concatenate([key_src, key_req])
    tag = jnp.concatenate(
        [jnp.full((T,), M, jnp.int32), jnp.arange(M, dtype=jnp.int32)]
    )
    v0 = jnp.concatenate([table[:, 0], jnp.zeros((M,), table.dtype)])
    v1 = jnp.concatenate([table[:, 1], jnp.zeros((M,), table.dtype)])
    sk, stag, a0, a1 = jax.lax.sort((keys, tag, v0, v1), num_keys=1)
    is_src = sk % 2 == 0

    def combine(l, r):
        lsrc, l0, l1 = l
        rsrc, r0, r1 = r
        pick_r = rsrc
        return (
            jnp.logical_or(lsrc, rsrc),
            jnp.where(pick_r, r0, l0),
            jnp.where(pick_r, r1, l1),
        )

    _, p0, p1 = jax.lax.associative_scan(combine, (is_src, a0, a1))
    # unsort: requests carry tag m; sort by tag, sources go to the back
    _, o0, o1 = jax.lax.sort((stag, p0, p1), num_keys=1)
    return jnp.stack([o0[:M], o1[:M]], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=1 << 21)
    ap.add_argument("--T", type=int, default=1 << 19)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    M, T = args.M, args.T
    print(f"M={M} T={T}")

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    wg = jax.random.normal(key, (M, 2), jnp.float32) * 0.01
    table = jax.random.normal(key, (T, 2), jnp.float32)

    expect = np.zeros((T, 2), np.float32)
    np.add.at(expect, np.asarray(idx), np.asarray(wg))

    def run_grad(name, fn):
        g = jax.jit(lambda ix, w: fn(ix, w, T))
        got = np.asarray(g(idx, wg))
        err = np.abs(got - expect).max()
        rel = err / (np.abs(expect).max() + 1e-12)

        def op(ix, w):
            return fn(ix, w, T)[0, 0]

        secs = timeit_rep(lambda k: chain(op, k), idx, wg)
        report(f"{name} maxerr={err:.2e} rel={rel:.2e}", secs, M)

    def run_fwd(name, fn):
        g = jax.jit(fn)
        got = np.asarray(g(idx, table))
        ok = np.allclose(got, np.asarray(table)[np.asarray(idx)], atol=1e-5)

        def op(ix, tab):
            return fn(ix, tab)[0, 0]

        secs = timeit_rep(lambda k: chain(op, k), idx, table)
        report(f"{name} ok={ok}", secs, M, "tap")

    sel = args.only.split(",") if args.only else []
    if not sel or "two_sort" in sel:
        run_grad("grad two-sort sentinel", grad_two_sort)
    if not sel or "searchsorted" in sel:
        run_grad("grad sort+searchsorted", grad_sort_searchsorted)
    if not sel or "fwd_scan" in sel:
        run_fwd("fwd sort+scan+unsort", fwd_sorted_scan)


if __name__ == "__main__":
    main()
