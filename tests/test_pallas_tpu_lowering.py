"""Cross-platform TPU lowering checks for every Pallas kernel.

The interpreter (used by the CPU parity tests) hides Mosaic lowering
restrictions — e.g. tpu.iota is integer-only, which the tent-operand
kernels originally violated. ``jax.jit(...).trace(...).lower(
lowering_platforms=("tpu",))`` runs the real Pallas->Mosaic pipeline
(including the MLIR verifier) without TPU hardware, so a kernel that
passes here compiles on the chip up to Mosaic's backend."""

import jax
import jax.numpy as jnp
import pytest

import instant_nsr_pl_tpu.ops.cp_mlp_pallas as cmp
import instant_nsr_pl_tpu.ops.cp_pallas as cpp
import instant_nsr_pl_tpu.ops.sh_mlp_pallas as smp
from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_init
from instant_nsr_pl_tpu.ops.mlp import MLPSpec, mlp_init
from instant_nsr_pl_tpu.ops.sh import sh_output_dim


@pytest.fixture(autouse=True)
def _force_compiled(monkeypatch):
    monkeypatch.setattr(cmp, "_interpret_default", lambda: False)
    monkeypatch.setattr(smp, "_interpret_default", lambda: False)
    monkeypatch.setattr(cpp, "_interpret_default", lambda: False)


def _lower_ok(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.fixture(scope="module")
def setup():
    spec = CPSpec(64, (128, 2048), 16)
    mlp_spec = MLPSpec(
        dim_in=32, dim_out=16, n_neurons=64, n_hidden_layers=1,
        activation="ReLU", precision="bf16",
    )
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    return {
        "spec": spec,
        "mlp_spec": mlp_spec,
        "cp_params": cp_init(k[0], spec),
        "mlp_params": mlp_init(k[1], mlp_spec),
        "x": jax.random.uniform(k[2], (4096, 3)),
        "ct": jax.random.normal(k[3], (4096, 16)),
        "k": k,
    }


def test_cp_mlp_lowers(setup):
    spec, mlp_spec = setup["spec"], setup["mlp_spec"]
    x, ct = setup["x"], setup["ct"]

    def loss(cp, ml):
        return (cmp.cp_mlp_apply(cp, ml, x, spec, mlp_spec) * ct).sum()

    _lower_ok(jax.grad(loss, argnums=(0, 1)), setup["cp_params"], setup["mlp_params"])


def test_sh_mlp_lowers(setup):
    k = setup["k"]
    tex_spec = MLPSpec(
        dim_in=16 + sh_output_dim(4), dim_out=3, n_neurons=64,
        n_hidden_layers=2, activation="ReLU", precision="bf16",
    )
    tex_params = mlp_init(k[4], tex_spec)
    feats = jax.random.normal(k[5], (4096, 16))
    dirs = jax.random.normal(k[6], (4096, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ct3 = jax.random.normal(k[7], (4096, 3))

    def loss(ml, ft):
        return (smp.sh_mlp_apply(ml, ft, dirs, tex_spec, 4, 16) * ct3).sum()

    _lower_ok(jax.grad(loss, argnums=(0, 1)), tex_params, feats)


def test_cp_product_and_jac_lower(setup):
    cp_params, x, k = setup["cp_params"], setup["x"], setup["k"]
    lx, ly, lz = (cp_params[f"line_1_{a}"] for a in range(3))
    basis = cp_params["basis_1"]
    u3 = x.T
    ctf = jax.random.normal(k[3], (16, 4096))
    ctj = jax.random.normal(k[4], (3, 16, 4096))

    def loss_p(a, b, c, u):
        return cpp.cp_product(a, b, c, u, 2048).sum()

    _lower_ok(jax.grad(loss_p, argnums=(0, 1, 2, 3)), lx, ly, lz, u3)

    def loss_pj(a, b, c, u):
        e, j = cpp.cp_product_jac(a, b, c, u, 2048)
        return e.sum() + j.sum()

    _lower_ok(jax.grad(loss_pj, argnums=(0, 1, 2, 3)), lx, ly, lz, u3)

    def loss_jb(a, b, c, bb, u):
        e, j = cpp.cp_product_jac_basis(a, b, c, bb, u, 2048)
        return (e * ctf).sum() + (j * ctj).sum()

    _lower_ok(
        jax.grad(loss_jb, argnums=(0, 1, 2, 3, 4)), lx, ly, lz, basis, u3
    )


def test_stacked_kernels_lower(setup):
    from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_init
    from instant_nsr_pl_tpu.ops.cp_mlp_pallas import cp_mlp_apply_stacked
    from instant_nsr_pl_tpu.ops.mlp import MLPSpec, mlp_init

    spec = CPSpec(64, (129, 2049), 16)
    mlp_spec = MLPSpec(
        dim_in=32, dim_out=16, n_neurons=64, n_hidden_layers=1,
        activation="ReLU", precision="bf16",
    )
    k = setup["k"]
    cp_params = cp_init(k[0], spec)
    mlp_params = mlp_init(k[1], mlp_spec)
    x = setup["x"]
    ct = setup["ct"]

    def loss(cp, ml):
        return (cp_mlp_apply_stacked(cp, ml, x, spec, mlp_spec) * ct).sum()

    _lower_ok(jax.grad(loss, argnums=(0, 1)), cp_params, mlp_params)

    u3 = x.T
    ctf = jax.random.normal(k[3], (32, 4096))
    ctj = jax.random.normal(k[4], (3, 32, 4096))

    def loss_j(cp):
        e, j = cpp.cp_jac_basis_stacked(cp, u3, spec)
        return (e * ctf).sum() + (j * ctj).sum()

    _lower_ok(jax.grad(loss_j), cp_params)
