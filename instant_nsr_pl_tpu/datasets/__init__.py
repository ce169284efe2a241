"""Dataset loaders (the reference's datasets/ package role)."""

from instant_nsr_pl_tpu.datasets import blender, synthetic  # noqa: F401
