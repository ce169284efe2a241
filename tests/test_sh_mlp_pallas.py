"""Fused SH+MLP radiance kernel (ops/sh_mlp_pallas.py) vs its plain-XLA
twin: forward, parameter gradients, and the differentiable feature
cotangent, with and without post-SH extras (NeuS normals). Runs through
the Pallas interpreter on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_nsr_pl_tpu.ops.mlp import MLPSpec, mlp_init
from instant_nsr_pl_tpu.ops.sh import sh_output_dim
from instant_nsr_pl_tpu.ops.sh_mlp_pallas import (
    fusable,
    sh_mlp_apply,
    sh_mlp_reference,
)


def _setup(n=300, n_pre=16, n_post=0, degree=4, n_hidden=2, d_out=3, seed=0):
    n_feat = n_pre + n_post
    spec = MLPSpec(
        dim_in=n_feat + sh_output_dim(degree),
        dim_out=d_out,
        n_neurons=32,
        n_hidden_layers=n_hidden,
        activation="ReLU",
        precision="bf16",
    )
    assert fusable(spec, n_feat, degree)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    params = mlp_init(k1, spec)
    params = [
        {"w": l["w"], "b": 0.1 * jax.random.normal(k, l["b"].shape)}
        for l, k in zip(params, jax.random.split(k2, len(params)))
    ]
    features = jax.random.normal(k3, (n, n_feat))
    dirs = jax.random.normal(k4, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return spec, params, features, dirs, n_pre


@pytest.mark.parametrize("n_pre,n_post", [(16, 0), (16, 3)])
def test_forward_matches_reference(n_pre, n_post):
    spec, params, features, dirs, n_pre = _setup(n_pre=n_pre, n_post=n_post)
    ref = sh_mlp_reference(params, features, dirs, spec, 4, n_pre)
    got = sh_mlp_apply(params, features, dirs, spec, 4, n_pre)
    scale = max(float(jnp.abs(ref).max()), 1e-3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2 * scale
    )


@pytest.mark.parametrize("n_pre,n_post", [(16, 0), (16, 3)])
def test_gradients_match_reference(n_pre, n_post):
    spec, params, features, dirs, n_pre = _setup(
        n=257, n_pre=n_pre, n_post=n_post
    )
    ct = jax.random.normal(jax.random.PRNGKey(9), (257, spec.dim_out))

    def loss(fn):
        def f(p, feat):
            return jnp.sum(fn(p, feat, dirs, spec, 4, n_pre) * ct)

        return f

    g_ref = jax.grad(loss(sh_mlp_reference), argnums=(0, 1))(params, features)
    g_got = jax.grad(loss(sh_mlp_apply), argnums=(0, 1))(params, features)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=2.5e-2 * scale)


def test_dirs_cotangent_zero():
    spec, params, features, dirs, n_pre = _setup(n=64)

    def loss(d):
        return jnp.sum(sh_mlp_apply(params, features, d, spec, 4, n_pre))

    gd = jax.grad(loss)(dirs)
    np.testing.assert_array_equal(np.asarray(gd), 0.0)


def test_multiblock_accumulation(monkeypatch):
    import instant_nsr_pl_tpu.ops.sh_mlp_pallas as m

    monkeypatch.setattr(m, "_BLOCK_N", 128)
    spec, params, features, dirs, n_pre = _setup(n=515, n_post=3)
    ct = jax.random.normal(jax.random.PRNGKey(5), (515, spec.dim_out))

    def loss(fn):
        def f(p, feat):
            return jnp.sum(fn(p, feat, dirs, spec, 4, n_pre) * ct)

        return f

    g_ref = jax.grad(loss(sh_mlp_reference), argnums=(0, 1))(params, features)
    g_got = jax.grad(loss(m.sh_mlp_apply), argnums=(0, 1))(params, features)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=2.5e-2 * scale)


def test_fusable_gates():
    spec, *_ = _setup()
    import dataclasses

    assert not fusable(dataclasses.replace(spec, activation="Softplus"), 16, 4)
    assert not fusable(dataclasses.replace(spec, precision="fp32"), 16, 4)
    assert not fusable(spec, 15, 4)  # dim mismatch
    assert not fusable(spec, 16, 3)  # dim mismatch via degree


@pytest.mark.parametrize("with_normal", [False, True])
def test_volume_radiance_fused_matches_composed(with_normal):
    from instant_nsr_pl_tpu.config import config_from_dict
    from instant_nsr_pl_tpu.registry import models
    import instant_nsr_pl_tpu.models  # noqa: F401

    def make(fused):
        cfg = config_from_dict(
            {
                "name": "volume-radiance",
                "input_feature_dim": 16 + (3 if with_normal else 0),
                "fused": fused,
                "dir_encoding_config": {
                    "otype": "SphericalHarmonics",
                    "degree": 4,
                },
                "mlp_network_config": {
                    "otype": "FullyFusedMLP",
                    "activation": "ReLU",
                    "output_activation": "Sigmoid",
                    "n_neurons": 32,
                    "n_hidden_layers": 2,
                },
            }
        )
        return models.make("volume-radiance", cfg)

    fused = make(True)
    composed = make(False)
    assert fused.fused and not composed.fused
    params = fused.init(jax.random.PRNGKey(0))
    n = 150
    feats = jax.random.normal(jax.random.PRNGKey(1), (n, 16))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    extras = ()
    if with_normal:
        nrm = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
        extras = (nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True),)

    c_f = fused.apply(params, feats, dirs, *extras)
    c_c = composed.apply(params, feats, dirs, *extras)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_c), atol=5e-3)

    def loss(model):
        def f(p, ft):
            return jnp.sum(model.apply(p, ft, dirs, *extras) ** 2)

        return f

    g_f = jax.grad(loss(fused), argnums=(0, 1))(params, feats)
    g_c = jax.grad(loss(composed), argnums=(0, 1))(params, feats)
    leaves_f = jax.tree_util.tree_leaves(g_f)
    leaves_c = jax.tree_util.tree_leaves(g_c)
    assert len(leaves_f) == len(leaves_c)
    for a, b in zip(leaves_c, leaves_f):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=3e-2 * scale)
