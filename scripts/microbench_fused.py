"""TPU microbench for the round-2 fused Pallas kernels.

Times, at the bench workload (N=262144, flagship CP spec C=64
R=(128,2048) F=16, 64-wide MLPs):

  1. cp_product fwd / fwd+bwd           (tent-operand kernel vs PERF.md's
                                         4.1 / 7.5 ms concatenated-table
                                         numbers and the 5.6 / 13.9 XLA)
  2. cp_mlp_apply fwd / fwd+bwd         (fused density eval) vs composed
                                         cp_encode(pallas) + mlp_apply
  3. sh_mlp_apply fwd / fwd+bwd         (fused radiance eval) vs composed
                                         SH + mlp_apply
  4. cp_product_jac_basis fwd / fwd+bwd vs cp_product_jac + host projection

Measurement discipline (CLAUDE.md): block_until_ready does NOT sync the
tunneled TPU — every timing ends in a value fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_encode, cp_init
from instant_nsr_pl_tpu.ops.cp_mlp_pallas import cp_mlp_apply, fusable
from instant_nsr_pl_tpu.ops.cp_pallas import (
    cp_product,
    cp_product_jac,
    cp_product_jac_basis,
)
from instant_nsr_pl_tpu.ops.mlp import MLPSpec, mlp_apply, mlp_init
from instant_nsr_pl_tpu.ops.sh import sh_output_dim, spherical_harmonics_encoding
from instant_nsr_pl_tpu.ops.sh_mlp_pallas import sh_mlp_apply

N = 262144


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def report(name, t):
    print(f"{name:56s} {t*1e3:8.2f} ms")


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    spec = CPSpec(64, (128, 2048), 16)
    mlp_spec = MLPSpec(
        dim_in=spec.n_output_dims, dim_out=16, n_neurons=64,
        n_hidden_layers=1, activation="ReLU", precision="bf16",
    )
    assert fusable(spec, mlp_spec)
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    cp_params = cp_init(k[0], spec)
    mlp_params = mlp_init(k[1], mlp_spec)
    x = jax.random.uniform(k[2], (N, 3))
    u3 = x.T
    ct = jax.random.normal(k[3], (N, 16))

    # -- 1. raw cp_product (scale 1: R=2048) -------------------------------
    lx, ly, lz = (cp_params[f"line_1_{a}"] for a in range(3))
    f1 = jax.jit(lambda a, b, c, u: cp_product(a, b, c, u, 2048).sum())
    report("cp_product fwd (tent kernel, R=2048)", timeit(f1, lx, ly, lz, u3))
    g1 = jax.jit(jax.grad(
        lambda a, b, c, u: cp_product(a, b, c, u, 2048).sum(), argnums=(0, 1, 2, 3)
    ))
    report("cp_product fwd+bwd (tent kernel)", timeit(g1, lx, ly, lz, u3))

    # -- 2. fused density eval ---------------------------------------------
    fd = jax.jit(lambda cp, ml, xx: cp_mlp_apply(cp, ml, xx, spec, mlp_spec).sum())
    report("cp_mlp_apply fwd (fused density)", timeit(fd, cp_params, mlp_params, x))
    gd = jax.jit(jax.grad(
        lambda cp, ml, xx: (cp_mlp_apply(cp, ml, xx, spec, mlp_spec) * ct).sum(),
        argnums=(0, 1),
    ))
    report("cp_mlp_apply fwd+bwd (fused density)", timeit(gd, cp_params, mlp_params, x))

    def composed(cp, ml, xx):
        enc = cp_encode(cp, xx, spec, impl="pallas")
        return mlp_apply(ml["layers"] if isinstance(ml, dict) else ml, enc, mlp_spec)

    fc = jax.jit(lambda cp, ml, xx: composed(cp, ml, xx).sum())
    report("composed cp_encode(pallas)+mlp fwd", timeit(fc, cp_params, mlp_params, x))
    gc = jax.jit(jax.grad(
        lambda cp, ml, xx: (composed(cp, ml, xx) * ct).sum(), argnums=(0, 1)
    ))
    report("composed cp_encode(pallas)+mlp fwd+bwd",
           timeit(gc, cp_params, mlp_params, x))

    # -- 3. fused radiance eval ---------------------------------------------
    tex_spec = MLPSpec(
        dim_in=16 + sh_output_dim(4), dim_out=3, n_neurons=64,
        n_hidden_layers=2, activation="ReLU", precision="bf16",
    )
    tex_params = mlp_init(k[4], tex_spec)
    feats = jax.random.normal(k[5], (N, 16))
    dirs = jax.random.normal(k[6], (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ct3 = jax.random.normal(k[7], (N, 3))

    fr = jax.jit(lambda ml, ft: sh_mlp_apply(ml, ft, dirs, tex_spec, 4, 16).sum())
    report("sh_mlp_apply fwd (fused radiance)", timeit(fr, tex_params, feats))
    gr = jax.jit(jax.grad(
        lambda ml, ft: (sh_mlp_apply(ml, ft, dirs, tex_spec, 4, 16) * ct3).sum(),
        argnums=(0, 1),
    ))
    report("sh_mlp_apply fwd+bwd (fused radiance)", timeit(gr, tex_params, feats))

    def composed_tex(ml, ft):
        d01 = (dirs + 1.0) / 2.0
        sh = spherical_harmonics_encoding(d01, 4)
        return mlp_apply(ml, jnp.concatenate([ft, sh], axis=-1), tex_spec)

    fr2 = jax.jit(lambda ml, ft: composed_tex(ml, ft).sum())
    report("composed SH+mlp fwd", timeit(fr2, tex_params, feats))
    gr2 = jax.jit(jax.grad(
        lambda ml, ft: (composed_tex(ml, ft) * ct3).sum(), argnums=(0, 1)
    ))
    report("composed SH+mlp fwd+bwd", timeit(gr2, tex_params, feats))

    # -- 4. jac with fused basis --------------------------------------------
    basis = cp_params["basis_1"]
    ctf = jax.random.normal(k[3], (16, N))
    ctj = jax.random.normal(k[4], (3, 16, N))

    fj = jax.jit(lambda a, b, c, bb, u: sum(
        o.sum() for o in cp_product_jac_basis(a, b, c, bb, u, 2048)
    ))
    report("cp_product_jac_basis fwd", timeit(fj, lx, ly, lz, basis, u3))
    gj = jax.jit(jax.grad(
        lambda a, b, c, bb, u: (
            (cp_product_jac_basis(a, b, c, bb, u, 2048)[0] * ctf).sum()
            + (cp_product_jac_basis(a, b, c, bb, u, 2048)[1] * ctj).sum()
        ),
        argnums=(0, 1, 2, 3, 4),
    ))
    report("cp_product_jac_basis fwd+bwd", timeit(gj, lx, ly, lz, basis, u3))

    def jac_unfused(a, b, c, bb, u):
        p, j = cp_product_jac(a, b, c, u, 2048)
        bt = bb.T.astype(jnp.bfloat16)
        e = jnp.dot(bt, p.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        jj = jnp.einsum("fc,acn->afn", bt, j.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return e, jj

    fj2 = jax.jit(lambda a, b, c, bb, u: sum(o.sum() for o in jac_unfused(a, b, c, bb, u)))
    report("cp_product_jac + host projection fwd", timeit(fj2, lx, ly, lz, basis, u3))
    gj2 = jax.jit(jax.grad(
        lambda a, b, c, bb, u: (
            (jac_unfused(a, b, c, bb, u)[0] * ctf).sum()
            + (jac_unfused(a, b, c, bb, u)[1] * ctj).sum()
        ),
        argnums=(0, 1, 2, 3, 4),
    ))
    report("cp_product_jac + host projection fwd+bwd",
           timeit(gj2, lx, ly, lz, basis, u3))


if __name__ == "__main__":
    main()
