from instant_nsr_pl_tpu.ops.activations import get_activation, trunc_exp, scale_anything
from instant_nsr_pl_tpu.ops.contraction import (
    ContractionType,
    contract_coords,
    contract_to_unisphere,
    uncontract_from_unisphere,
)
from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect, get_ray_directions, get_rays
from instant_nsr_pl_tpu.ops.sh import sh_output_dim, spherical_harmonics_encoding
from instant_nsr_pl_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_fast,
    hashgrid_init,
)
from instant_nsr_pl_tpu.ops.mlp import MLPSpec, mlp_init, mlp_apply
from instant_nsr_pl_tpu.ops.isosurface import marching_tetrahedra
from instant_nsr_pl_tpu.ops.rendering import (
    render_weight_from_density,
    render_weight_from_alpha,
    accumulate_along_rays,
    exclusive_cumprod_segments,
    segmented_cumsum,
    distortion_loss,
)
from instant_nsr_pl_tpu.ops.marching import (
    OccGridSpec,
    OccupancyGridState,
    occupancy_grid_init,
    occupancy_grid_update,
    occupancy_lookup,
    occupancy_lookup_coords,
    march_rays,
    packed_positions,
    PackedSamples,
)
