"""Radiance/texture heads.

Reference: models/texture.py (VolumeRadiance 10-36, VolumeColor 39-57).
``VolumeRadiance`` concatenates geometry features, an SH-encoded view
direction and optional extras (surface normals for NeuS) and runs a small
MLP; ``VolumeColor`` is the view-independent variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from instant_nsr_pl_tpu.registry import models
from instant_nsr_pl_tpu.ops.activations import get_activation
from instant_nsr_pl_tpu.models.network_utils import (
    CompositeEncoding,
    SphericalHarmonicsEncoding,
    get_encoding,
    get_mlp,
)


@models.register("volume-radiance")
class VolumeRadiance:
    def __init__(self, config):
        self.config = config
        self.n_dir_dims = int(config.get("n_dir_dims", 3))
        self.n_output_dims = 3
        self.dir_encoding = get_encoding(self.n_dir_dims, config.dir_encoding_config)
        self.n_input_dims = (
            int(config.input_feature_dim) + self.dir_encoding.n_output_dims
        )
        self.network = get_mlp(
            self.n_input_dims, self.n_output_dims, config.mlp_network_config
        )
        # Applied ONLY when configured (reference models/texture.py:33-35):
        # the NeRF configs put Sigmoid on the MLP's output_activation instead,
        # and applying both would clamp rgb into sigmoid([0,1]) = [.5, .73].
        self.color_activation = (
            get_activation(config.color_activation)
            if "color_activation" in config
            else None
        )
        # fused SH+MLP Pallas path (ops/sh_mlp_pallas.py): SH-encoded dirs
        # + bf16 ReLU MLP, i.e. the reference's tcnn radiance head. Default
        # on TPU only (interpret mode is correct but slow elsewhere);
        # dims re-checked per call because extras (NeuS normals) arrive at
        # call time.
        inner = getattr(self.dir_encoding, "encoding", None)
        sh_ok = (
            isinstance(self.dir_encoding, CompositeEncoding)
            and not self.dir_encoding.include_xyz
            and isinstance(inner, SphericalHarmonicsEncoding)
        )
        self._sh_degree = inner.degree if sh_ok else None
        import os

        default_fused = sh_ok and jax.default_backend() == "tpu"
        # INSR_DISABLE_FUSED_SH gates just this head (the bench A/B measures
        # density-fused + radiance-composed as its own arm: the TPU microbench
        # has the fused radiance ~0.2 ms/262k SLOWER than composed)
        self.fused = (
            bool(config.get("fused", default_fused))
            and sh_ok
            and not os.environ.get("INSR_DISABLE_FUSED")
            and not os.environ.get("INSR_DISABLE_FUSED_SH")
        )
        if self.fused:
            from instant_nsr_pl_tpu.ops.sh_mlp_pallas import fusable

            n_feat = self.n_input_dims - self.dir_encoding.n_output_dims
            self.fused = fusable(self.network.spec, n_feat, self._sh_degree)

    def init(self, rng):
        k_enc, k_net = jax.random.split(rng)
        return {
            "dir_encoding": self.dir_encoding.init(k_enc),
            "network": self.network.init(k_net),
        }

    def apply(self, params, features, dirs, *extras, step=None):
        """features (N, D), dirs (N, 3) unit world dirs, extras e.g. normals."""
        n_feat = features.shape[-1] + sum(e.shape[-1] for e in extras)
        if self.fused and n_feat + self.dir_encoding.n_output_dims == (
            self.network.spec.dim_in
        ):
            from instant_nsr_pl_tpu.ops.sh_mlp_pallas import sh_mlp_apply

            feats_all = (
                jnp.concatenate([features] + list(extras), axis=-1)
                if extras
                else features
            )
            color = sh_mlp_apply(
                params["network"]["layers"],
                feats_all.astype(jnp.float32),
                dirs,
                self.network.spec,
                self._sh_degree,
                features.shape[-1],
            )
            color = self.network.output_activation(color)
            if self.color_activation is not None:
                color = self.color_activation(color)
            return color
        d = (dirs + 1.0) / 2.0  # map to [0,1] (tcnn SH convention)
        dirs_embd = self.dir_encoding.apply(params["dir_encoding"], d, step=step)
        inp = jnp.concatenate(
            [features, dirs_embd] + list(extras), axis=-1
        ).astype(jnp.float32)
        color = self.network.apply(params["network"], inp, step=step)
        if self.color_activation is not None:
            color = self.color_activation(color)
        return color


@models.register("volume-color")
class VolumeColor:
    def __init__(self, config):
        self.config = config
        self.n_output_dims = 3
        self.n_input_dims = int(config.input_feature_dim)
        self.network = get_mlp(
            self.n_input_dims, self.n_output_dims, config.mlp_network_config
        )
        self.color_activation = (
            get_activation(config.color_activation)
            if "color_activation" in config
            else None
        )

    def init(self, rng):
        return {"network": self.network.init(rng)}

    def apply(self, params, features, *args, step=None):
        color = self.network.apply(
            params["network"], features.astype(jnp.float32), step=step
        )
        if self.color_activation is not None:
            color = self.color_activation(color)
        return color
