from instant_nsr_pl_tpu.ops.activations import get_activation, trunc_exp, scale_anything
from instant_nsr_pl_tpu.ops.contraction import ContractionType, contract_to_unisphere
from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect, get_ray_directions, get_rays
from instant_nsr_pl_tpu.ops.sh import spherical_harmonics_encoding
from instant_nsr_pl_tpu.ops.hashgrid import HashGridSpec, hashgrid_init, hashgrid_encode
from instant_nsr_pl_tpu.ops.mlp import MLPSpec, mlp_init, mlp_apply
from instant_nsr_pl_tpu.ops.rendering import (
    render_weight_from_density,
    render_weight_from_alpha,
    accumulate_along_rays,
    exclusive_cumprod_segments,
    distortion_loss,
)
from instant_nsr_pl_tpu.ops.marching import (
    OccupancyGridState,
    occupancy_grid_init,
    occupancy_grid_update,
    march_rays,
    PackedSamples,
)
