"""Timed Pallas gather probes: can any Mosaic-expressible mechanism beat
XLA's ~5.4 ns/row gather loop on TPU v5e?

Variants:
  A. scalar fori_loop of dynamic row reads (pl.ds) from a VMEM-resident
     table, accumulate — measures raw dynamic-row-read throughput.
  B. same with 8 independent accumulators (breaks the loop carry).
  C. XLA jnp.take baseline on identical shapes.

Table: (8192, 128) f32 = 4 MB (one hashed level, feature-packed).
M = 2^20 random rows per measurement; grid over chunks with the index
chunk scalar-prefetched to SMEM.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 8192
M = 1 << 20
CHUNK = 4096


def fetch(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(f, *args, n=5):
    r = f(*args)
    fetch(r)
    t0 = time.perf_counter()
    for _ in range(n):
        fetch(f(*args))
    return (time.perf_counter() - t0) / n


def kernel_a(idx_ref, tab_ref, out_ref):
    def body(i, acc):
        row = idx_ref[i]
        return acc + tab_ref[pl.ds(row, 1), :]

    acc = jax.lax.fori_loop(0, CHUNK, body, jnp.zeros((1, 128), jnp.float32))
    out_ref[:, :] = jnp.broadcast_to(acc, (8, 128))


def kernel_b(idx_ref, tab_ref, out_ref):
    def body(i, accs):
        return tuple(
            accs[j] + tab_ref[pl.ds(idx_ref[i * 8 + j], 1), :] for j in range(8)
        )

    accs = jax.lax.fori_loop(
        0, CHUNK // 8, body, tuple(jnp.zeros((1, 128), jnp.float32) for _ in range(8))
    )
    out_ref[:, :] = jnp.concatenate(accs, axis=0)


def kernel_c(idx_ref, tab_ref, out_ref):
    """Gather rows into a VMEM scratch then reduce — writes each gathered
    row (closer to the real encode, which must KEEP per-tap values)."""

    def inner(scratch):
        def body(i, _):
            scratch[pl.ds(i % 8, 1), :] = tab_ref[pl.ds(idx_ref[i], 1), :]
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)
        out_ref[:, :] = scratch[:, :]

    pl.run_scoped(inner, pltpu.VMEM((8, 128), jnp.float32))


def make_pallas(kernel):
    grid = M // CHUNK

    def run(idx, tab):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
        )(idx, tab)

    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (T, 128), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)

    @jax.jit
    def xla_take(idx, tab):
        g = jnp.take(tab, idx, axis=0)  # (M, 128)
        return g.reshape(M // CHUNK, CHUNK, 128).sum(axis=1)

    t = timeit(xla_take, idx, tab)
    print(f"XLA take {M} rows x128f32: {t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row",
          flush=True)

    for name, kern in (
        ("A scalar-loop", kernel_a),
        ("B 8-stream", kernel_b),
        ("C store-rows", kernel_c),
    ):
        try:
            f = make_pallas(kern)
            t = timeit(f, idx, tab)
            print(f"Pallas {name}: {t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row",
                  flush=True)
        except Exception as e:
            print(f"Pallas {name}: FAIL {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
