"""Isolated A/B of the march compaction selection on the real TPU.

Measures (a) raw lax.sort at the relevant key counts (the floor arithmetic
for PERF.md), (b) the single-sort selection vs the two-level super-group
selection (ops/marching.py _select_groups) at the production NeRF/NeuS
march shape (R=8192, sg=128, cap_g=32768, ~4-13% live).

Every timing ends in a value fetch: on the tunneled axon runtime
block_until_ready does NOT wait for remote execution (PERF.md).

Usage: python scripts/microbench_sort.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from instant_nsr_pl_tpu.ops.marching import _select_groups


def timed(fn, *args, iters=50):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), out)  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    print(f"devices: {jax.devices()}")

    # raw sort floor at the relevant sizes
    for n in (1 << 20, 1 << 18, 1 << 17, 1 << 15):
        keys = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 24)
        keys = keys.astype(jnp.int32)
        f = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
        dt = timed(f, keys, iters=args.iters)
        print(f"lax.sort i32 n={n:>8}: {dt * 1e3:7.3f} ms  ({dt / n * 1e9:.2f} ns/key)")

    # production-shaped selection: R=8192 rays, sg=128 groups/ray
    R, sg, cap_g = 8192, 128, 32768
    for live in (0.04, 0.13):
        gvalid = jax.random.bernoulli(jax.random.PRNGKey(1), live, (R, sg))

        def single(gv):
            src = jnp.arange(R * sg, dtype=jnp.int32)
            keys = jnp.where(gv.reshape(-1), src, jnp.int32(R * sg))
            (sorted_keys,) = jax.lax.sort((keys,), num_keys=1)
            return sorted_keys[:cap_g]

        f1 = jax.jit(single)
        f2 = jax.jit(lambda gv: _select_groups(gv, R, sg, cap_g))
        import numpy as np

        np.testing.assert_array_equal(
            np.asarray(f1(gvalid)), np.asarray(f2(gvalid))
        )
        d1 = timed(f1, gvalid, iters=args.iters)
        d2 = timed(f2, gvalid, iters=args.iters)
        print(
            f"selection live={live:.0%}: single {d1 * 1e3:.3f} ms, "
            f"two-level {d2 * 1e3:.3f} ms ({d1 / d2:.2f}x)"
        )


if __name__ == "__main__":
    main()
