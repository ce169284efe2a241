"""Training systems (the reference's systems/ package role)."""

import instant_nsr_pl_tpu.models  # noqa: F401  (register model classes)
from instant_nsr_pl_tpu.systems import nerf, neus  # noqa: F401  (register)
from instant_nsr_pl_tpu.systems.base import BaseSystem, C  # noqa: F401
