"""CP encoding TPU microbench: does XLA fuse the one-hot generation into
the dot (FLOP-bound, ~ms) or materialize (N, R) operands (GB of HBM)?

Times cp_encode forward and fwd+bwd at the reference sample workload and
prints per-variant ms. Compare against the hash encode's ~142 ms fwd /
~130 ms bwd at the same N (PERF.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_encode, cp_init


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    # value fetch = the only true sync on the tunneled runtime
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    n = 262144
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
    ct = jax.random.normal(jax.random.PRNGKey(1), (n,))

    for name, spec in [
        ("cp C=64 R=(128,2048) F=16", CPSpec(64, (128, 2048), 16)),
        ("cp C=128 R=(64,512,4096) F=16", CPSpec(128, (64, 512, 4096), 16)),
        ("cp C=32 R=(2048,) F=0", CPSpec(32, (2048,), 0)),
    ]:
        params = cp_init(jax.random.PRNGKey(2), spec)

        fwd = jax.jit(lambda p, xx: cp_encode(p, xx, spec).sum(axis=-1))
        t_f = timeit(fwd, params, x)

        def loss(p, xx):
            return (cp_encode(p, xx, spec).sum(axis=-1) * ct).sum()

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_b = timeit(grad, params, x)
        print(
            f"{name}: fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_b*1e3:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
