"""Implicit geometry fields: density (NeRF) and SDF (NeuS/Neuralangelo).

Re-implements the reference's models/geometry.py (VolumeDensity at 115-140,
VolumeSDF at 143-238, isosurface machinery at 32-112) as functional JAX
modules. Key differences from the torch design, driven by TPU/XLA:

- analytic SDF gradients use one ``jax.vjp`` over the batched field (the
  reference uses ``torch.autograd.grad(create_graph=True)``,
  models/geometry.py:176-180); JAX keeps this differentiable at second order
  so the eikonal loss backprops through it without special-casing;
- finite-difference gradients evaluate the 6-point stencil as one batched
  network call (N*6 positions) to keep the MXU busy;
- the progressive finite-difference eps (Neuralangelo; reference
  models/geometry.py:219-238) is a pure function of the traced step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.registry import models
from instant_nsr_pl_tpu.ops.activations import get_activation
from instant_nsr_pl_tpu.ops.contraction import ContractionType, contract_to_unisphere
from instant_nsr_pl_tpu.models.network_utils import (
    get_encoding,
    get_encoding_with_network,
    get_mlp,
)


class BaseImplicitGeometry:
    def __init__(self, config):
        self.config = config
        self.radius = float(config.radius)
        self.contraction_type = ContractionType.AABB  # assigned by the renderer

    def init(self, rng):
        raise NotImplementedError

    def forward_level(self, params, points, step=None):
        """Scalar level-set field for marching cubes (negative inside)."""
        raise NotImplementedError

    def isosurface(self, params, step=None):
        """Two-stage marching cubes (coarse pass over the full cube, fine pass
        over the 10%-padded coarse bbox; reference models/geometry.py:83-112).
        Returns a dict with 'v_pos' (V,3) float32 and 't_pos_idx' (F,3) int32.
        """
        from instant_nsr_pl_tpu.models.isosurface import extract_isosurface

        return extract_isosurface(self, params, step=step)


@models.register("volume-density")
class VolumeDensity(BaseImplicitGeometry):
    """NeRF geometry: contraction -> hash encoding + MLP -> (density, feature).

    Reference: models/geometry.py:115-140.
    """

    def __init__(self, config):
        super().__init__(config)
        self.n_input_dims = int(config.get("n_input_dims", 3))
        self.n_output_dims = int(config.feature_dim)
        self.encoding_with_network = get_encoding_with_network(
            self.n_input_dims,
            self.n_output_dims,
            config.xyz_encoding_config,
            config.mlp_network_config,
        )
        self.density_activation = get_activation(
            config.get("density_activation", "trunc_exp")
        )
        self.density_bias = float(config.get("density_bias", 0.0))

    def init(self, rng):
        return self.encoding_with_network.init(rng)

    def apply(self, params, points, step=None, grouped=False):
        """points: (..., 3) world -> (density (...,), feature (..., D)).

        ``grouped=True`` asserts the flattened points are aligned uniform-
        step blocks (the group-compacted march layout) — enables hash-grid
        per-group tap dedup if configured (configure_dedup)."""
        pts = contract_to_unisphere(points, self.radius, self.contraction_type)
        out = self.encoding_with_network.apply(
            params, pts.reshape(-1, self.n_input_dims), step=step,
            grouped=grouped,
        ).reshape(*points.shape[:-1], self.n_output_dims)
        out = out.astype(jnp.float32)
        density = self.density_activation(out[..., 0] + self.density_bias)
        return density, out

    def configure_dedup(self, group: int, step: float):
        """Forward the renderer's block guarantee to a hash encoding (no-op
        for encodings without tap dedup). ``step`` in encode [0,1] coords."""
        enc = self.encoding_with_network.encoding
        fn = getattr(enc, "configure_dedup", None)
        if fn is not None:
            fn(group, step)

    def forward_level(self, params, points, step=None):
        density, _ = self.apply(params, points, step=step)
        return -density


@models.register("volume-sdf")
class VolumeSDF(BaseImplicitGeometry):
    """SDF geometry with analytic or finite-difference gradients.

    Reference: models/geometry.py:143-238.
    """

    def __init__(self, config):
        super().__init__(config)
        self.n_output_dims = int(config.feature_dim)
        self.encoding = get_encoding(3, config.xyz_encoding_config)
        self.network = get_mlp(
            self.encoding.n_output_dims, self.n_output_dims, config.mlp_network_config
        )
        self.grad_type = str(config.get("grad_type", "analytic"))
        # Analytic gradients differentiate THROUGH d(sdf)/dx (eikonal loss —
        # a second-order graph). Two ways to keep that correct:
        #  - jac path (TPU default when the encoding supports it): the
        #    encoding returns (feat, analytic jacobian) from ONE custom-VJP
        #    op (ops/hashgrid.py hashgrid_encode_with_jac) and the sdf
        #    gradient is chained through a plain VJP of the smooth MLP —
        #    no forward-mode ever meets a custom op, and the table gradient
        #    keeps the fast sort/MXU segment-sum backward;
        #  - autodiff fallback: the encoding switches to its pure-autodiff
        #    variant (scatter-add table gradient, arbitrary order).
        # `analytic_jac: true|false` in the geometry config overrides the
        # platform default (TPU on, others off).
        self.use_jac = False
        if self.grad_type == "analytic":
            jac_capable = getattr(self.encoding, "has_jac", False)
            default_jac = jax.default_backend() == "tpu" and jac_capable
            self.use_jac = bool(config.get("analytic_jac", default_jac))
            if self.use_jac and not jac_capable:
                raise ValueError(
                    "analytic_jac: true requires an encoding with a jac path "
                    "(HashGrid/ProgressiveBandHashGrid)"
                )
            inner = getattr(self.encoding, "encoding", self.encoding)
            if not self.use_jac and hasattr(inner, "grad_mode"):
                inner.grad_mode = "autodiff"
        self.fd_eps_config = config.get("finite_difference_eps", 1e-3)
        self.sdf_activation = (
            get_activation(config.sdf_activation) if "sdf_activation" in config else None
        )
        self.sdf_bias = float(config.get("sdf_bias", 0.0))

    def init(self, rng):
        k_enc, k_net = jax.random.split(rng)
        return {
            "encoding": self.encoding.init(k_enc),
            "network": self.network.init(k_net),
        }

    def _field(self, params, points, step=None):
        """(N, 3) world -> (sdf (N,), feature (N, D))."""
        pts = contract_to_unisphere(points, self.radius, self.contraction_type)
        out = self.network.apply(
            params["network"],
            self.encoding.apply(params["encoding"], pts, step=step),
            step=step,
        ).astype(jnp.float32)
        sdf = out[..., 0]
        if self.sdf_activation is not None:
            sdf = self.sdf_activation(sdf + self.sdf_bias)
        return sdf, out

    def finite_difference_eps(self, step=None):
        """Stencil eps; 'progressive' ties it to the current hash level's cell
        size (reference: models/geometry.py:219-238)."""
        if isinstance(self.fd_eps_config, (int, float)):
            return jnp.float32(self.fd_eps_config)
        assert self.fd_eps_config == "progressive", self.fd_eps_config
        hg = self.config.xyz_encoding_config
        assert hg.otype == "ProgressiveBandHashGrid"
        if step is None:
            level = hg.n_levels
        else:
            level = jnp.minimum(
                hg.start_level + jnp.maximum(step - hg.start_step, 0) // hg.update_steps,
                hg.n_levels,
            )
        grid_res = hg.base_resolution * jnp.power(
            jnp.float32(hg.per_level_scale), level - 1
        )
        return 2.0 * self.radius / grid_res

    def configure_dedup(self, group: int, step: float):
        """Forward the renderer's aligned-block guarantee to a hash encoding
        (no-op otherwise); enables per-group tap dedup on BOTH the plain
        encode and the jac (second-order) path. ``step`` in encode coords."""
        fn = getattr(self.encoding, "configure_dedup", None)
        if fn is not None:
            fn(group, step)

    def apply(
        self,
        params,
        points,
        step=None,
        with_grad=True,
        with_feature=True,
        with_laplace=False,
        grouped=False,
    ):
        """Returns (sdf, [grad,] [feature,] [laplace]) matching the reference's
        tuple protocol (models/geometry.py:158-210). ``grouped=True``
        asserts aligned uniform-step blocks (group-compacted march)."""
        points = points.reshape(-1, 3)
        grad = feature = laplace = None

        if with_grad and self.grad_type == "analytic" and self.use_jac:
            # jac path: encoding returns (feat, d feat/d pts) from one
            # custom-VJP op; sdf gradient = jac^T @ d sdf/d feat with the
            # MLP part as a plain (smooth) VJP. AABB contraction is linear,
            # so the world-space chain factor is a constant.
            assert self.contraction_type == ContractionType.AABB, (
                "analytic_jac supports AABB contraction only"
            )
            pts = contract_to_unisphere(points, self.radius, self.contraction_type)
            enc, jac_enc = self.encoding.apply_with_jac(
                params["encoding"], pts, step=step, grouped=grouped
            )  # (N, E), (3, N, E)

            def head(e):
                out = self.network.apply(params["network"], e, step=step)
                out = out.astype(jnp.float32)
                s = out[..., 0]
                if self.sdf_activation is not None:
                    s = self.sdf_activation(s + self.sdf_bias)
                return s, out

            # forward-mode through the (smooth, cheap) MLP only: linearize
            # once, push the 3 encoding-jacobian rows as tangents. NEVER
            # reverse-over-reverse here — a nested-vjp MLP graph SIGILLs the
            # TPU compiler's fusion cost model at scale (CLAUDE.md), which
            # is also why the non-jac analytic path below uses JVPs.
            (sdf, feature), head_lin = jax.linearize(head, enc)
            scale = 0.5 / self.radius  # d pts / d points (AABB is linear)
            jac32 = jac_enc.astype(enc.dtype)
            grad = jnp.stack(
                [head_lin(jac32[d] * scale)[0] for d in range(3)], axis=-1
            )
        elif with_grad and self.grad_type == "analytic":
            # forward-mode (3 JVPs, one per input dim): with a 3-D input this
            # is the natural autodiff direction, stays differentiable at
            # second order for the eikonal loss, and avoids the nested-VJP
            # graph that crashes the TPU compiler's fusion cost model at
            # large sample counts (SIGILL in TpuPriorityFusionQueue,
            # capacity >= ~64k; see CLAUDE.md). The reference uses
            # torch.autograd.grad(create_graph=True) — reverse mode —
            # because that is what torch makes convenient
            # (models/geometry.py:176-180).
            sdf, feature = self._field(params, points, step=step)
            grads = []
            for d in range(3):
                tangent = jnp.zeros_like(points).at[:, d].set(1.0)
                _, dsdf = jax.jvp(
                    lambda p: self._field(params, p, step=step)[0],
                    (points,),
                    (tangent,),
                )
                grads.append(dsdf)
            grad = jnp.stack(grads, axis=-1)
        else:
            sdf, feature = self._field(params, points, step=step)
            if with_grad:  # finite differences (Neuralangelo)
                eps = self.finite_difference_eps(step)
                offsets = jnp.array(
                    [
                        [1, 0, 0], [-1, 0, 0],
                        [0, 1, 0], [0, -1, 0],
                        [0, 0, 1], [0, 0, -1],
                    ],
                    jnp.float32,
                )
                pts_d = jnp.clip(
                    points[:, None, :] + eps * offsets[None, :, :],
                    -self.radius,
                    self.radius,
                )
                sdf_d, _ = self._field(params, pts_d.reshape(-1, 3), step=step)
                sdf_d = sdf_d.reshape(-1, 6)
                grad = 0.5 * (sdf_d[:, 0::2] - sdf_d[:, 1::2]) / eps
                if with_laplace:
                    laplace = (sdf_d[:, 0::2] + sdf_d[:, 1::2] - 2.0 * sdf[:, None]).sum(
                        -1
                    ) / (eps**2)

        rv = [sdf]
        if with_grad:
            rv.append(grad)
        if with_feature:
            rv.append(feature)
        if with_laplace:
            assert self.grad_type == "finite_difference", (
                "laplace requires grad_type='finite_difference'"
            )
            rv.append(laplace)
        return rv[0] if len(rv) == 1 else tuple(rv)

    def forward_level(self, params, points, step=None):
        sdf, _ = self._field(params, points.reshape(-1, 3), step=step)
        return sdf.reshape(points.shape[:-1])
