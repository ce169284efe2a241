"""Dataset loaders (the reference's datasets/ package role)."""

from instant_nsr_pl_tpu.datasets import (  # noqa: F401
    blender,
    colmap,
    dtu,
    synthetic,
)
