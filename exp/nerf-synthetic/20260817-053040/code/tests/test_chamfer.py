"""Chamfer evaluation tests: sampling density, exact analytic cases, and the
NeuS-mesh-vs-ground-truth loop on the synthetic scene's main sphere."""

import numpy as np

from instant_nsr_pl_tpu.ops.isosurface import marching_tetrahedra
from instant_nsr_pl_tpu.utils.chamfer import chamfer_distance, sample_mesh_surface


def _sphere_mesh(radius, res=48, extent=1.0):
    axes = np.linspace(-extent, extent, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(axes, axes, axes, indexing="ij")
    vals = np.sqrt(gx**2 + gy**2 + gz**2) - radius
    verts, faces = marching_tetrahedra(vals, 0.0)
    scale = 2 * extent / (res - 1)
    return {"v_pos": verts * scale - extent, "t_pos_idx": faces}


def test_surface_sampling_on_surface():
    mesh = _sphere_mesh(0.6)
    pts = sample_mesh_surface(mesh["v_pos"], mesh["t_pos_idx"], 5000)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 0.6) < 0.01


def test_chamfer_identical_meshes_near_zero():
    mesh = _sphere_mesh(0.6)
    d = chamfer_distance(mesh, mesh, n_points=20000)
    # floor = inter-sample spacing ~ sqrt(area/n)/2 = 0.0075 for this mesh
    assert d["chamfer"] < 0.012


def test_chamfer_concentric_spheres():
    a = _sphere_mesh(0.5)
    b = _sphere_mesh(0.6)
    d = chamfer_distance(a, b, n_points=20000)
    # concentric spheres differ by ~0.1 everywhere
    assert 0.07 < d["chamfer"] < 0.13
    assert 0.07 < d["accuracy"] < 0.13
    assert 0.07 < d["completeness"] < 0.13


def test_chamfer_point_cloud_inputs():
    rng = np.random.RandomState(0)
    p = rng.randn(5000, 3)
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    d = chamfer_distance(p, p * 1.1, n_points=5000)
    assert abs(d["chamfer"] - 0.1) < 0.02
