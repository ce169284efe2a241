"""Regression test for the double-sigmoid bug: when the texture MLP's
output_activation is Sigmoid (NeRF configs), VolumeRadiance must NOT apply a
second default color_activation — that clamps rgb into sigmoid([0,1]) =
[0.5, 0.73] and caps training at ~18 PSNR. The reference applies
color_activation only when configured (models/texture.py:33-35)."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import models
import instant_nsr_pl_tpu.models  # noqa: F401


def _radiance(extra=None):
    cfg = {
        "name": "volume-radiance",
        "input_feature_dim": 8,
        "dir_encoding_config": {"otype": "SphericalHarmonics", "degree": 2},
        "mlp_network_config": {
            "otype": "FullyFusedMLP",
            "activation": "ReLU",
            "output_activation": "Sigmoid",
            "n_neurons": 16,
            "n_hidden_layers": 1,
        },
    }
    if extra:
        cfg.update(extra)
    return models.make("volume-radiance", config_from_dict(cfg))


def test_no_default_color_activation():
    tex = _radiance()
    params = tex.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (256, 8)) * 10.0
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (256, 1))
    out = np.asarray(tex.apply(params, feats, dirs))
    # single sigmoid can reach outside [0.5, 0.73]; a double sigmoid cannot
    assert out.min() < 0.45 or out.max() > 0.8, (
        f"rgb range [{out.min():.3f}, {out.max():.3f}] looks double-squashed"
    )
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_explicit_color_activation_applied():
    tex = _radiance(
        {
            "mlp_network_config": {
                "otype": "FullyFusedMLP",
                "activation": "ReLU",
                "output_activation": "none",
                "n_neurons": 16,
                "n_hidden_layers": 1,
            },
            "color_activation": "sigmoid",
        }
    )
    params = tex.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (256, 8)) * 10.0
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (256, 1))
    out = np.asarray(tex.apply(params, feats, dirs))
    assert out.min() >= 0.0 and out.max() <= 1.0
