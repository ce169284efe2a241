"""Microbenchmarks for the Pallas hash-grid kernel design (round 2).

Measures the primitive costs that decide the encode/grad strategy on the
real TPU: XLA gather, Pallas in-VMEM scalar-loop gather, Mosaic vector
gather lowering (if any), Pallas serial scatter-accumulate, XLA sort.

Run: python scripts/microbench_pallas.py [--quick] [--only a,b]

Measurement discipline (CLAUDE.md): block_until_ready does NOT sync the
tunneled TPU — timings run the op K times inside one jit (chained through
the index array so XLA can't dedup) and difference two K values to cancel
the tunnel round-trip overhead.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1 << 19  # hash table rows per level
F = 2


def timeit_rep(make_rep, idx, *args, reps=(1, 9)):
    results = {}
    for k in reps:
        f = make_rep(k)
        r = f(idx, *args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            r = f(idx, *args)
            float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        results[k] = (time.perf_counter() - t0) / n
    k0, k1 = reps
    return (results[k1] - results[k0]) / (k1 - k0)


def dep_perturb(ix, scalar):
    """Data-dependent no-op: +1 iff scalar > 1e30 (never true, unprovable)."""
    return ix + (scalar > 1e30).astype(jnp.int32)


def chain(op, K):
    """Build jitted fn running `op(ix, *args) -> scalar` K times chained."""

    @jax.jit
    def f(ix, *args):
        def body(i, carry):
            ix_c, acc = carry
            s = op(ix_c, *args)
            return dep_perturb(ix_c, s), acc + s

        _, acc = jax.lax.fori_loop(0, K, body, (ix, jnp.float32(0)))
        return acc

    return f


def report(name, secs, n_ops, unit="tap"):
    print(f"{name:58s} {secs*1e3:9.3f} ms   {secs/n_ops*1e9:8.3f} ns/{unit}")


# ---------------------------------------------------------------------------
# XLA baselines
# ---------------------------------------------------------------------------

def bench_xla_gather(M):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (F, T), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)

    def op(ix, tab):
        return jnp.take(tab, ix, axis=1)[0, 0]

    secs = timeit_rep(lambda k: chain(op, k), idx, table)
    report(f"XLA gather (F,T) axis=1, M={M}", secs, M)

    table_r = jnp.asarray(np.random.randn(T, 8).astype(np.float32))

    def op_row(ix, tab):
        return jnp.take(tab, ix, axis=0)[0, 0]

    secs = timeit_rep(lambda k: chain(op_row, k), idx, table_r)
    report(f"XLA gather (T,8) rows, M={M}", secs, M)


def bench_xla_scatter(M):
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    upd = jax.random.normal(key, (M, F), jnp.float32)

    def op(ix, up):
        z = jnp.zeros((T, F), jnp.float32)
        return z.at[ix].add(up)[0, 0]

    secs = timeit_rep(lambda k: chain(op, k), idx, upd, reps=(1, 3))
    report(f"XLA scatter-add (T,F), M={M}", secs, M, "upd")


def bench_xla_sort(M):
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (M,), 0, T, jnp.int32)
    vals = jax.random.normal(key, (M,), jnp.float32)

    def op(ix, v):
        sk, sv = jax.lax.sort((ix, v), num_keys=1)
        return (sk[0] + sv[0]).astype(jnp.float32)

    secs = timeit_rep(lambda k: chain(op, k), keys, vals)
    report(f"XLA sort (key,val) M={M}", secs, M, "elt")


def bench_xla_seggrad(M):
    """Sorted segment-sum table grad candidate: sort + segment reduce."""
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    upd = jax.random.normal(key, (M, F), jnp.float32)

    def op(ix, up):
        sk, u0, u1 = jax.lax.sort((ix, up[:, 0], up[:, 1]), num_keys=1)
        g0 = jax.ops.segment_sum(u0, sk, num_segments=T)
        g1 = jax.ops.segment_sum(u1, sk, num_segments=T)
        return g0[0] + g1[0]

    secs = timeit_rep(lambda k: chain(op, k), idx, upd, reps=(1, 3))
    report(f"XLA sort+segment_sum grad, M={M}", secs, M, "upd")


# ---------------------------------------------------------------------------
# Pallas scalar-loop gather: table resident in VMEM, idx in SMEM
# ---------------------------------------------------------------------------

def pallas_scalar_gather(idx, table, chunk=2048, unroll=4):
    M = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            for u in range(unroll):
                j = i * unroll + u
                row = idx_ref[j]
                out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(row, 1), :]
            return 0

        jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)

    return pl.pallas_call(
        kernel,
        grid=(M // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, F), table.dtype),
    )(idx, table)


def bench_pallas_scalar_gather(M):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, F), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    for unroll in (1, 8):
        g = functools.partial(pallas_scalar_gather, unroll=unroll)
        try:
            r = jax.jit(g)(idx, table)
            ok = np.allclose(np.asarray(r), np.asarray(table)[np.asarray(idx)])

            def op(ix, tab):
                return g(ix, tab)[0, 0]

            secs = timeit_rep(lambda k: chain(op, k), idx, table, reps=(1, 3))
            report(f"Pallas scalar gather unroll={unroll} ok={ok}, M={M}", secs, M)
        except Exception as e:
            print(f"Pallas scalar gather unroll={unroll}: FAILED {type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------------------
# Pallas vector gather attempts
# ---------------------------------------------------------------------------

def bench_pallas_vector_gather(M):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, F), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    chunk = 8192

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:, :] = table_ref[:, :][idx_ref[:], :]

    def g(ix, tab):
        return pl.pallas_call(
            kernel,
            grid=(M // chunk,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, F), tab.dtype),
        )(ix, tab)

    try:
        r = jax.jit(g)(idx, table)
        ok = np.allclose(np.asarray(r), np.asarray(table)[np.asarray(idx)])

        def op(ix, tab):
            return g(ix, tab)[0, 0]

        secs = timeit_rep(lambda k: chain(op, k), idx, table, reps=(1, 3))
        report(f"Pallas fancy-index vector gather ok={ok}, M={M}", secs, M)
    except Exception as e:
        print(f"Pallas fancy-index gather: FAILED {type(e).__name__}: {str(e)[:300]}")


def bench_pallas_takealong_col(M):
    """take_along_axis down a (T,) column with (chunk,) indices."""
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, 128), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    chunk = 8192

    def kernel(idx_ref, table_ref, out_ref):
        ids = idx_ref[:].reshape(chunk, 1)
        out_ref[:, :] = jnp.take_along_axis(table_ref[:, :], ids, axis=0)

    def g(ix, tab):
        return pl.pallas_call(
            kernel,
            grid=(M // chunk,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), tab.dtype),
        )(ix, tab)

    try:
        r = jax.jit(g)(idx, table)
        ok = np.allclose(np.asarray(r)[:, 0], np.asarray(table)[np.asarray(idx), 0])

        def op(ix, tab):
            return g(ix, tab)[0, 0]

        secs = timeit_rep(lambda k: chain(op, k), idx, table, reps=(1, 3))
        report(f"Pallas take_along_axis axis=0 ok={ok}, M={M}", secs, M)
    except Exception as e:
        print(f"Pallas take_along_axis axis=0: FAILED {type(e).__name__}: {str(e)[:300]}")


def bench_pallas_lane_gather(M):
    """Gather within 128 lanes (tests tpu.DynamicGatherOp availability)."""
    key = jax.random.PRNGKey(0)
    rows = M // 128
    table = jax.random.normal(key, (8, 128), jnp.float32)
    idx = jax.random.randint(key, (rows, 128), 0, 128, jnp.int32)

    def kernel(idx_ref, table_ref, out_ref):
        t = jnp.broadcast_to(table_ref[0:1, :], idx_ref.shape)
        out_ref[:, :] = jnp.take_along_axis(t, idx_ref[:, :], axis=1)

    def g(ix, tab):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )(ix, tab)

    try:
        r = jax.jit(g)(idx, table)
        expect = np.asarray(table)[0][np.asarray(idx)]
        ok = np.allclose(np.asarray(r), expect)

        def op(ix, tab):
            return g(ix, tab)[0, 0]

        secs = timeit_rep(lambda k: chain(op, k), idx, table, reps=(1, 9))
        report(f"Pallas lane-gather (128-entry LUT) ok={ok}", secs, M)
    except Exception as e:
        print(f"Pallas lane-gather: FAILED {type(e).__name__}: {str(e)[:300]}")


def bench_pallas_sublane_gather(M):
    """Gather along sublanes: (T8, 128) table, per-lane row indices in [0, T8)."""
    key = jax.random.PRNGKey(0)
    t8 = 512
    rows = M // 128
    table = jax.random.normal(key, (t8, 128), jnp.float32)
    idx = jax.random.randint(key, (rows, 128), 0, t8, jnp.int32)

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(
            jnp.broadcast_to(table_ref[:, :], (t8, 128)), idx_ref[:, :], axis=0
        )

    def g(ix, tab):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )(ix, tab)

    try:
        r = jax.jit(g)(idx, table)
        tn, ixn = np.asarray(table), np.asarray(idx)
        expect = tn[ixn, np.arange(128)[None, :]]
        ok = np.allclose(np.asarray(r), expect)

        def op(ix, tab):
            return g(ix, tab)[0, 0]

        secs = timeit_rep(lambda k: chain(op, k), idx, table, reps=(1, 9))
        report(f"Pallas sublane-gather (512-row cols) ok={ok}", secs, M)
    except Exception as e:
        print(f"Pallas sublane-gather: FAILED {type(e).__name__}: {str(e)[:300]}")


# ---------------------------------------------------------------------------
# Pallas serial scatter-accumulate into VMEM-resident table
# ---------------------------------------------------------------------------

def pallas_scatter_add(idx, upd, chunk=2048, unroll=4):
    M = idx.shape[0]

    def kernel(idx_ref, upd_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        def body(i, _):
            for u in range(unroll):
                j = i * unroll + u
                row = idx_ref[j]
                out_ref[pl.ds(row, 1), :] = (
                    out_ref[pl.ds(row, 1), :] + upd_ref[pl.ds(j, 1), :]
                )
            return 0

        jax.lax.fori_loop(0, chunk // unroll, body, 0, unroll=False)

    return pl.pallas_call(
        kernel,
        grid=(M // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
    )(idx, upd)


def bench_pallas_scatter(M):
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    upd = jax.random.normal(key, (M, F), jnp.float32)
    expect = np.zeros((T, F), np.float32)
    np.add.at(expect, np.asarray(idx), np.asarray(upd))
    for unroll in (1, 8):
        g = functools.partial(pallas_scatter_add, unroll=unroll)
        try:
            r = jax.jit(g)(idx, upd)
            ok = np.allclose(np.asarray(r), expect, atol=1e-3)

            def op(ix, up):
                return g(ix, up)[0, 0]

            secs = timeit_rep(lambda k: chain(op, k), idx, upd, reps=(1, 3))
            report(f"Pallas scatter-add unroll={unroll} ok={ok}, M={M}", secs, M, "upd")
        except Exception as e:
            print(f"Pallas scatter-add unroll={unroll}: FAILED {type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------------------
# Pallas one-hot matmul grad, one-hots generated in VMEM (never HBM)
# ---------------------------------------------------------------------------

def pallas_onehot_grad(idx, wg, bdim=512, chunk=1024):
    M = idx.shape[0]
    adim = T // bdim

    def kernel(idx_ref, wg_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        ids = idx_ref[0, :]  # (chunk,)
        a = (ids // bdim).reshape(chunk, 1)
        b = (ids % bdim).reshape(chunk, 1)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (chunk, adim), 1)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (chunk, bdim), 1)
        u = (a == iota_a).astype(jnp.bfloat16)  # (chunk, A)
        w0 = (b == iota_b).astype(jnp.float32)  # (chunk, B)
        wv = jnp.concatenate(
            [(w0 * wg_ref[:, j : j + 1]).astype(jnp.bfloat16) for j in range(F)],
            axis=1,
        )  # (chunk, B*F)
        acc = jnp.dot(u.T, wv, preferred_element_type=jnp.float32)
        out_ref[:, :] = out_ref[:, :] + acc

    return pl.pallas_call(
        kernel,
        grid=(M // chunk,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((adim, bdim * F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((adim, bdim * F), jnp.float32),
    )(idx.reshape(M // chunk, chunk), wg)


def bench_pallas_onehot_grad(M):
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    wg = jax.random.normal(key, (M, F), jnp.float32)
    bdim, chunk = 512, 1024
    g = functools.partial(pallas_onehot_grad, bdim=bdim, chunk=chunk)
    try:
        r = jax.jit(g)(idx, wg)
        expect = np.zeros((T, F), np.float32)
        np.add.at(expect, np.asarray(idx), np.asarray(wg))
        got = np.asarray(r).reshape(T // bdim, F, bdim).transpose(0, 2, 1).reshape(T, F)
        ok = np.allclose(got, expect, atol=0.05, rtol=0.05)

        def op(ix, up):
            return g(ix, up)[0, 0]

        secs = timeit_rep(lambda k: chain(op, k), idx, wg, reps=(1, 3))
        report(f"Pallas one-hot matmul grad ok={ok}, M={M}", secs, M, "upd")
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"Pallas one-hot grad: FAILED {type(e).__name__}: {str(e)[:200]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    M = 1 << 20 if args.quick else 1 << 22
    print(f"platform={jax.devices()[0].platform} M={M} T={T}")

    benches = {
        "xla_gather": lambda: bench_xla_gather(M),
        "xla_sort": lambda: bench_xla_sort(M),
        "xla_seggrad": lambda: bench_xla_seggrad(M),
        "lane": lambda: bench_pallas_lane_gather(M),
        "sublane": lambda: bench_pallas_sublane_gather(M),
        "vec": lambda: bench_pallas_vector_gather(M),
        "takealong": lambda: bench_pallas_takealong_col(M),
        "scalar": lambda: bench_pallas_scalar_gather(M),
        "scatter": lambda: bench_pallas_scatter(M),
        "onehot": lambda: bench_pallas_onehot_grad(M),
        "xla_scatter": lambda: bench_xla_scatter(min(M, 1 << 18)),
    }
    for name, fn in benches.items():
        if args.only and name not in args.only.split(","):
            continue
        print(f"--- {name}")
        try:
            fn()
        except Exception as e:
            print(f"{name} crashed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
