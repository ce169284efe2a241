"""Isosurface extraction tests: marching tetrahedra (numpy + native C++)
and the two-stage extraction wrapper."""

import numpy as np
import pytest

from instant_nsr_pl_tpu.ops import native
from instant_nsr_pl_tpu.ops.isosurface import marching_tetrahedra


def sphere_grid(res=48, radius=0.6, extent=1.0):
    axes = np.linspace(-extent, extent, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axes, axes, axes, indexing="ij")
    vals = np.sqrt(gx**2 + gy**2 + gz**2) - radius
    scale = 2 * extent / (res - 1)
    return vals, scale, extent


def to_world(verts, scale, extent):
    return verts * scale - extent


def test_sphere_surface_accuracy():
    vals, scale, extent = sphere_grid()
    verts, faces = marching_tetrahedra(vals, 0.0)
    assert verts.shape[0] > 100
    assert faces.shape[0] > 100
    w = to_world(verts, scale, extent)
    r = np.linalg.norm(w, axis=1)
    # every welded vertex lies on the sphere up to one cell size
    assert np.abs(r - 0.6).max() < scale
    assert np.abs(r - 0.6).mean() < 0.25 * scale


def test_faces_index_valid_and_nondegenerate():
    vals, _, _ = sphere_grid(res=24)
    verts, faces = marching_tetrahedra(vals, 0.0)
    assert faces.min() >= 0 and faces.max() < verts.shape[0]
    assert (faces[:, 0] != faces[:, 1]).all()
    assert (faces[:, 1] != faces[:, 2]).all()


def test_orientation_outward():
    vals, scale, extent = sphere_grid(res=32)
    verts, faces = marching_tetrahedra(vals, 0.0)
    w = to_world(verts, scale, extent)
    tri = w[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(axis=1)
    # outward normal for a sphere: n . c > 0
    agree = (n * c).sum(axis=1) > 0
    assert agree.mean() > 0.99


def test_watertight_sphere():
    vals, _, _ = sphere_grid(res=24)
    _, faces = marching_tetrahedra(vals, 0.0)
    # every edge is shared by exactly 2 faces for a closed surface
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_empty_and_full_grids():
    vals = np.ones((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(vals, 0.0)
    assert verts.shape == (0, 3) and faces.shape == (0, 3)
    verts, faces = marching_tetrahedra(-vals, 0.0)
    assert verts.shape == (0, 3) and faces.shape == (0, 3)


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_native_matches_numpy():
    vals, _, _ = sphere_grid(res=32)
    v_np, f_np = marching_tetrahedra(vals, 0.0)
    v_cc, f_cc = native.marching_tetrahedra_native(vals, 0.0)
    assert v_np.shape == v_cc.shape
    assert f_np.shape == f_cc.shape
    # same welded vertex set (orderings may differ)
    def canon(v):
        return np.sort(v.round(5).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)

    assert (canon(v_np) == canon(v_cc)).all()


def test_two_stage_extraction_on_sdf_geometry():
    import jax.numpy as jnp

    from instant_nsr_pl_tpu.config import config_from_dict
    from instant_nsr_pl_tpu.models.isosurface import extract_isosurface

    class AnalyticSphere:
        radius = 1.0
        config = config_from_dict({"isosurface": {"resolution": 48, "chunk": 65536}})

        def forward_level(self, params, points, step=None):
            return jnp.linalg.norm(points, axis=-1) - 0.55

    mesh = extract_isosurface(AnalyticSphere(), None)
    r = np.linalg.norm(mesh["v_pos"], axis=1)
    assert mesh["v_pos"].shape[0] > 100
    # fine pass reduces error well below one coarse cell (2/48 ~ 0.042)
    assert np.abs(r - 0.55).max() < 0.02
