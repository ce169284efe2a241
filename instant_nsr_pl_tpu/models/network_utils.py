"""Encoding / MLP factories (the reference's models/network_utils.py role,
reference lines 14-215), re-designed functionally for JAX.

Every module here is a *static* Python object (safe to close over in jit)
exposing ``init(rng) -> params`` and ``apply(params, x, step) -> out``.
Training-schedule state (progressive hash-grid level unmasking, frequency
coarse-to-fine masks) is a pure function of the traced ``step`` scalar instead
of Python-side mutation — no recompilation, no host round-trips.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from instant_nsr_pl_tpu.ops.activations import get_activation
from instant_nsr_pl_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_fast,
    hashgrid_init,
)
from instant_nsr_pl_tpu.ops.mlp import MLPSpec, mlp_apply, mlp_init
from instant_nsr_pl_tpu.ops.sh import sh_output_dim, spherical_harmonics_encoding


class VanillaFrequency:
    """sin/cos frequency bands with an optional coarse-to-fine cosine mask
    schedule (reference: models/network_utils.py:14-37)."""

    def __init__(self, in_channels, config):
        self.n_frequencies = int(config["n_frequencies"])
        self.n_input_dims = in_channels
        self.n_output_dims = in_channels * 2 * self.n_frequencies
        self.n_masking_step = int(config.get("n_masking_step", 0))
        self.freq_bands = tuple(2.0**i for i in range(self.n_frequencies))

    def init(self, rng):
        return {}

    def mask(self, step):
        n = self.n_frequencies
        if self.n_masking_step <= 0 or step is None:
            return jnp.ones((n,), jnp.float32)
        x = jnp.clip(
            step / self.n_masking_step * n - jnp.arange(n, dtype=jnp.float32),
            0.0,
            1.0,
        )
        return (1.0 - jnp.cos(math.pi * x)) / 2.0

    def apply(self, params, x, step=None):
        mask = self.mask(step)
        out = []
        for i, freq in enumerate(self.freq_bands):
            for fn in (jnp.sin, jnp.cos):
                out.append(fn(freq * x) * mask[i])
        return jnp.concatenate(out, axis=-1)


class HashGridEncoding:
    """Plain multiresolution hash grid (tcnn ``HashGrid`` role).

    ``grad_mode`` ('fast' default): the training hot path uses the custom-VJP
    MXU table gradient (ops/hashgrid.py). Geometries that differentiate the
    encoding at second order (NeuS analytic eikonal) switch it to 'autodiff'.
    """

    def __init__(self, in_channels, config):
        self.spec = HashGridSpec.from_config(config, n_input_dims=in_channels)
        self.n_input_dims = in_channels
        self.n_output_dims = self.spec.n_output_dims
        # the MXU one-hot-matmul backward only pays off on TPU; CPU (tests)
        # keeps the plain autodiff scatter
        default_mode = "fast" if jax.default_backend() == "tpu" else "autodiff"
        self.grad_mode = str(config.get("grad_mode", default_mode))
        # per-group tap dedup spec, set by the renderer (configure_dedup)
        # when it can guarantee aligned-block-local inputs
        self.dedup_spec = None

    def configure_dedup(self, group: int, step: float):
        """Enable per-group tap dedup for ``grouped=True`` calls.

        ``group``: aligned block size of the input positions (the group-
        compacted march's k). ``step``: per-axis position step bound in the
        encoding's [0,1] coords. Coarse levels whose cell covers a whole
        block then gather one 27-point lattice per block instead of 8
        corners per sample (ops/hashgrid.py) — the gather rows are the hash
        path's measured floor (~5.4 ns/row, PERF.md)."""
        import dataclasses

        if group < 4 or step <= 0.0 or self.grad_mode != "fast":
            return
        spec = dataclasses.replace(
            self.spec, dedup_group=int(group), dedup_step=float(step)
        )
        if any(spec.dedup_group_sizes):
            self.dedup_spec = spec

    def _spec_for(self, x, grouped):
        """The dedup spec when the caller guarantees aligned blocks and the
        flattened batch divides the block size, else the plain spec."""
        if grouped and self.dedup_spec is not None:
            n = 1
            for d in x.shape[:-1]:
                n *= int(d)
            if n % self.dedup_spec.dedup_group == 0:
                return self.dedup_spec
        return self.spec

    def _encode(self, table, x, level_mask=None, grouped=False):
        if self.grad_mode == "fast":
            return hashgrid_encode_fast(
                table, x, self._spec_for(x, grouped), level_mask
            )
        return hashgrid_encode(table, x, self.spec, level_mask)

    def init(self, rng):
        return {"table": hashgrid_init(rng, self.spec)}

    def apply(self, params, x, step=None, grouped=False):
        return self._encode(params["table"], x, grouped=grouped)

    def apply_with_jac(self, params, x, step=None, grouped=False):
        """(feat, jac (3, ..., LF)): features + analytic position Jacobian
        from one set of gathers (ops/hashgrid.py hashgrid_encode_with_jac) —
        the second-order-capable fast path for NeuS analytic gradients."""
        from instant_nsr_pl_tpu.ops.hashgrid import hashgrid_encode_with_jac

        return hashgrid_encode_with_jac(
            params["table"], x, self._spec_for(x, grouped)
        )


class ProgressiveBandHashGrid(HashGridEncoding):
    """Neuralangelo progressive level unmasking: features above the current
    level are zeroed; level advances every ``update_steps`` after
    ``start_step`` (reference: models/network_utils.py:40-65)."""

    def __init__(self, in_channels, config):
        super().__init__(in_channels, config)
        self.start_level = int(config["start_level"])
        self.start_step = int(config["start_step"])
        self.update_steps = int(config["update_steps"])

    def current_level(self, step):
        if step is None:
            return self.spec.n_levels
        lvl = self.start_level + jnp.maximum(step - self.start_step, 0) // self.update_steps
        return jnp.minimum(lvl, self.spec.n_levels)

    def _mask(self, step):
        if step is None:
            return None
        lvl = self.current_level(step)
        return (jnp.arange(self.spec.n_levels) < lvl).astype(jnp.float32)

    def apply(self, params, x, step=None, grouped=False):
        return self._encode(
            params["table"], x, level_mask=self._mask(step), grouped=grouped
        )

    def apply_with_jac(self, params, x, step=None, grouped=False):
        from instant_nsr_pl_tpu.ops.hashgrid import hashgrid_encode_with_jac

        return hashgrid_encode_with_jac(
            params["table"], x, self._spec_for(x, grouped), self._mask(step)
        )


class VectorMatrixEncoding:
    """TensoRF-style VM factorized encoding (ops/vm.py) — the fewer-tap
    TPU-native alternative to HashGrid (18 vs 128 gathers per sample; see
    PERF.md). ``grad_mode`` mirrors HashGridEncoding: 'fast' uses the
    sort-based scatter-free table gradient, 'autodiff' keeps arbitrary-order
    differentiability for the NeuS analytic-eikonal path."""

    def __init__(self, in_channels, config):
        from instant_nsr_pl_tpu.ops.vm import VMSpec, vm_encode, vm_encode_fast, vm_init

        assert in_channels == 3, "VM encoding is 3-D"
        self.spec = VMSpec.from_config(config)
        self.n_input_dims = 3
        self.n_output_dims = self.spec.n_output_dims
        default_mode = "fast" if jax.default_backend() == "tpu" else "autodiff"
        self.grad_mode = str(config.get("grad_mode", default_mode))
        self._init = vm_init
        self._encode_auto = vm_encode
        self._encode_fast = vm_encode_fast

    def init(self, rng):
        return {"vm": self._init(rng, self.spec)}

    def apply(self, params, x, step=None):
        if self.grad_mode == "fast":
            return self._encode_fast(params["vm"], x, self.spec)
        return self._encode_auto(params["vm"], x, self.spec)


class CPEncoding:
    """CP (line-factorized) encoding (ops/cp.py) — the ZERO-gather
    TPU-native alternative: every table read is an exact one-hot matmul
    on the MXU, so the encode has no random-access memory ops at all
    (the cost knob on TPU; see PERF.md).

    ``grad_mode`` ('fast' default on TPU): 'fast' routes through the
    hand-written Pallas forward/backward kernel (ops/cp_pallas.py,
    one-hot operands stay in VMEM — 1.9-2x the XLA encode fwd+bwd,
    325k vs 295k rays/s end-to-end on the NeRF bench); 'autodiff'
    keeps the pure-XLA formulation, differentiable at arbitrary order
    (the NeuS analytic-eikonal path switches to it, models/geometry.py)."""

    def __init__(self, in_channels, config):
        from instant_nsr_pl_tpu.ops.cp import CPSpec, cp_encode, cp_init
        from instant_nsr_pl_tpu.ops.cp_pallas import _supported

        assert in_channels == 3, "CP encoding is 3-D"
        self.spec = CPSpec.from_config(config)
        self.n_input_dims = 3
        self.n_output_dims = self.spec.n_output_dims
        self._init = cp_init
        self._encode = cp_encode
        pallas_ok = all(
            _supported(r, self.spec.n_components) for r in self.spec.resolutions
        )
        default_mode = (
            "fast" if jax.default_backend() == "tpu" and pallas_ok else "autodiff"
        )
        self.grad_mode = str(config.get("grad_mode", default_mode))
        if self.grad_mode == "fast" and not pallas_ok:
            raise ValueError(
                "grad_mode: fast needs n_components divisible by 8; "
                f"got {self.spec}"
            )
        # stacked-scales fused density kernel (ops/cp_mlp_pallas.py): all
        # scales on one grid, full-width MXU matmuls. Needs exactly nested
        # resolutions, e.g. (129, 2049). Off by default pending TPU A/B.
        self.stack_scales = bool(config.get("stack_scales", False))
        if self.stack_scales:
            from instant_nsr_pl_tpu.ops.cp_mlp_pallas import stackable

            if not stackable(self.spec):
                raise ValueError(
                    "stack_scales needs nested resolutions: (R_max-1) must "
                    f"be a multiple of every (R_s-1); got {self.spec}"
                )

    def init(self, rng):
        return {"cp": self._init(rng, self.spec)}

    def apply(self, params, x, step=None):
        impl = "pallas" if self.grad_mode == "fast" else "xla"
        return self._encode(params["cp"], x, self.spec, impl=impl)

    def apply_with_jac(self, params, x, step=None):
        """(feat, d feat/d x) from one custom-VJP Pallas op per scale
        (ops/cp_pallas.py cp_product_jac) — lets the NeuS analytic-gradient
        mode keep the fast path (the same contract as the hash encoding's
        hashgrid_encode_with_jac)."""
        from instant_nsr_pl_tpu.ops.cp import cp_encode_with_jac

        impl = "pallas" if self.grad_mode == "fast" else "xla"
        return cp_encode_with_jac(
            params["cp"], x, self.spec, impl=impl,
            stacked=self.stack_scales and impl == "pallas",
        )


class SphericalHarmonicsEncoding:
    """Real-SH direction encoding (tcnn ``SphericalHarmonics`` role)."""

    def __init__(self, in_channels, config):
        assert in_channels == 3
        self.degree = int(config["degree"])
        self.n_input_dims = 3
        self.n_output_dims = sh_output_dim(self.degree)

    def init(self, rng):
        return {}

    def apply(self, params, x, step=None):
        return spherical_harmonics_encoding(x, self.degree)


class CompositeEncoding:
    """Optionally prepend the raw (rescaled) input to the encoding output
    (``include_xyz``; reference: models/network_utils.py:68-79)."""

    def __init__(self, encoding, include_xyz=False, xyz_scale=2.0, xyz_offset=-1.0):
        self.encoding = encoding
        self.include_xyz = include_xyz
        self.xyz_scale = xyz_scale
        self.xyz_offset = xyz_offset
        self.n_input_dims = encoding.n_input_dims
        self.n_output_dims = (
            int(include_xyz) * encoding.n_input_dims + encoding.n_output_dims
        )

    def init(self, rng):
        return self.encoding.init(rng)

    def apply(self, params, x, step=None, grouped=False):
        kw = {"grouped": True} if grouped and self.dedup_spec is not None else {}
        enc = self.encoding.apply(params, x, step=step, **kw)
        if not self.include_xyz:
            return enc
        return jnp.concatenate(
            [x * self.xyz_scale + self.xyz_offset, enc], axis=-1
        )

    @property
    def dedup_spec(self):
        return getattr(self.encoding, "dedup_spec", None)

    def configure_dedup(self, group: int, step: float):
        fn = getattr(self.encoding, "configure_dedup", None)
        if fn is not None:
            fn(group, step)

    @property
    def has_jac(self) -> bool:
        return hasattr(self.encoding, "apply_with_jac")

    def apply_with_jac(self, params, x, step=None, grouped=False):
        """(feat (..., D), jac (3, ..., D)) including the identity block of
        the prepended xyz channels (d(x*s+o)/dx = s * I)."""
        kw = {"grouped": True} if grouped and self.dedup_spec is not None else {}
        enc, jac = self.encoding.apply_with_jac(params, x, step=step, **kw)
        if not self.include_xyz:
            return enc, jac
        feat = jnp.concatenate([x * self.xyz_scale + self.xyz_offset, enc], axis=-1)
        eye = jnp.eye(3, dtype=jac.dtype) * self.xyz_scale  # (3, 3)
        jac_xyz = jnp.broadcast_to(
            eye.reshape(3, *(1,) * (x.ndim - 1), 3), (3, *x.shape[:-1], 3)
        )
        return feat, jnp.concatenate([jac_xyz, jac], axis=-1)


def get_encoding(n_input_dims, config):
    """Factory mirroring reference get_encoding (network_utils.py:82-92);
    input is assumed to live in [0, 1]."""
    otype = config["otype"]
    if otype == "VanillaFrequency":
        enc = VanillaFrequency(n_input_dims, config)
    elif otype == "ProgressiveBandHashGrid":
        enc = ProgressiveBandHashGrid(n_input_dims, config)
    elif otype == "HashGrid":
        enc = HashGridEncoding(n_input_dims, config)
    elif otype in ("VectorMatrix", "VM"):
        enc = VectorMatrixEncoding(n_input_dims, config)
    elif otype in ("CP", "TensorCP"):
        enc = CPEncoding(n_input_dims, config)
    elif otype == "SphericalHarmonics":
        enc = SphericalHarmonicsEncoding(n_input_dims, config)
    else:
        raise ValueError(f"Unknown encoding otype '{otype}'")
    return CompositeEncoding(
        enc, include_xyz=bool(config.get("include_xyz", False))
    )


class MLP:
    """Functional MLP module wrapping ops.mlp with the configured output
    activation (FullyFusedMLP/CutlassMLP/VanillaMLP roles)."""

    def __init__(self, dim_in, dim_out, config):
        self.spec = MLPSpec.from_config(dim_in, dim_out, config)
        self.output_activation = get_activation(
            config.get("output_activation", "none")
        )
        self.n_input_dims = dim_in
        self.n_output_dims = dim_out

    def init(self, rng):
        return {"layers": mlp_init(rng, self.spec)}

    def apply(self, params, x, step=None):
        return self.output_activation(mlp_apply(params["layers"], x, self.spec))


def get_mlp(n_input_dims, n_output_dims, config):
    """Factory mirroring reference get_mlp (network_utils.py:176-184). All
    otypes (FullyFusedMLP, CutlassMLP, VanillaMLP) map onto the same MXU
    matmul chain; otype only selects the precision policy + init, including
    the tcnn sphere init the reference writes into the fused param buffer
    (network_utils.py:142-173 — we use the clean math directly)."""
    return MLP(n_input_dims, n_output_dims, config)


class EncodingWithNetwork:
    """Fused encoding+MLP evaluation (tcnn ``NetworkWithInputEncoding`` role,
    reference network_utils.py:187-215).

    When the encoding is a fast-path CP encoding and the network is a
    bf16 ReLU MLP (the reference's FullyFused density head), the whole
    chain runs as ONE hand-written Pallas forward+backward kernel
    (ops/cp_mlp_pallas.py) — encode products, basis projections, and MLP
    activations never leave VMEM. Positions get a zero cotangent there
    (the only consumer, VolumeDensity, feeds stop-gradient march
    outputs). Everything else composes encoding.apply -> network.apply
    and lets XLA fuse."""

    def __init__(self, encoding, network):
        self.encoding = encoding
        self.network = network
        self.n_input_dims = encoding.n_input_dims
        self.n_output_dims = network.n_output_dims
        self.fused = False
        inner = getattr(encoding, "encoding", None)
        import os

        if (
            isinstance(encoding, CompositeEncoding)
            and not encoding.include_xyz
            and isinstance(inner, CPEncoding)
            and inner.grad_mode == "fast"
            # escape hatches for unattended runs (bench fallback) and for
            # the bench A/B's per-head arms (INSR_DISABLE_FUSED_CP gates
            # just the density head, _SH just the radiance head)
            and not os.environ.get("INSR_DISABLE_FUSED")
            and not os.environ.get("INSR_DISABLE_FUSED_CP")
        ):
            from instant_nsr_pl_tpu.ops.cp_mlp_pallas import fusable

            self.fused = fusable(inner.spec, network.spec)

    def init(self, rng):
        k_enc, k_net = jax.random.split(rng)
        return {
            "encoding": self.encoding.init(k_enc),
            "network": self.network.init(k_net),
        }

    def apply(self, params, x, step=None, grouped=False):
        if self.fused:
            from instant_nsr_pl_tpu.ops.cp_mlp_pallas import (
                cp_mlp_apply,
                cp_mlp_apply_stacked,
            )

            inner = self.encoding.encoding
            op = cp_mlp_apply_stacked if inner.stack_scales else cp_mlp_apply
            out = op(
                params["encoding"]["cp"],
                params["network"]["layers"],
                x,
                inner.spec,
                self.network.spec,
            )
            return self.network.output_activation(out)
        enc_kw = (
            {"grouped": True}
            if grouped and getattr(self.encoding, "dedup_spec", None) is not None
            else {}
        )
        return self.network.apply(
            params["network"],
            self.encoding.apply(params["encoding"], x, step=step, **enc_kw),
            step=step,
        )


def get_encoding_with_network(n_input_dims, n_output_dims, encoding_config, network_config):
    encoding = get_encoding(n_input_dims, encoding_config)
    network = get_mlp(encoding.n_output_dims, n_output_dims, network_config)
    return EncodingWithNetwork(encoding, network)
