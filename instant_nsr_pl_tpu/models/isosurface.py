"""Two-stage isosurface extraction for implicit geometries.

Mirrors the reference's ``MarchingCubeHelper`` + ``BaseImplicitGeometry.
isosurface`` (reference: models/geometry.py:32-112): a coarse pass over the
full ``[-r, r]^3`` cube locates the surface, a fine pass re-extracts inside
the 10%-padded bounding box of the coarse mesh. Level-grid evaluation is
jitted and chunked on device (the expensive part — hash+MLP per grid point);
the triangulation itself runs host-side (see ops/isosurface.py, with an
optional C++ fast path in ops/native).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.ops.isosurface import marching_tetrahedra

from instant_nsr_pl_tpu.ops import native as _native


def _eval_level_grid(geometry, params, vmin, vmax, resolution, chunk, step=None):
    """Evaluate geometry.forward_level on a regular grid, chunked.

    Returns (resolution, resolution, resolution) numpy float32, indexed
    values[x, y, z]."""
    axes = [np.linspace(vmin[i], vmax[i], resolution, dtype=np.float32) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    @jax.jit
    def level_fn(p):
        return geometry.forward_level(params, p, step=step)

    out = np.empty((pts.shape[0],), np.float32)
    n = pts.shape[0]
    chunk = int(chunk)
    import sys
    import time as _time

    t0 = last_beat = _time.time()
    # fixed chunk shape: pad the tail so XLA compiles once
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        block = pts[start:end]
        if block.shape[0] < chunk:
            block = np.concatenate(
                [block, np.zeros((chunk - block.shape[0], 3), np.float32)]
            )
        vals = np.asarray(level_fn(jnp.asarray(block)))
        out[start:end] = vals[: end - start]
        if _time.time() - last_beat > 60.0:
            # liveness heartbeat: a 512^3 grid is ~70 device dispatches over
            # the tunnel with no other output — the stall watchdog
            # (scripts/run_with_watchdog.sh) kills silent processes
            print(
                f"[isosurface] {end}/{n} points "
                f"({_time.time() - t0:.0f}s)",
                flush=True,
                file=sys.stderr,
            )
            last_beat = _time.time()
    return out.reshape(resolution, resolution, resolution)


def chunked_point_eval(fn, points, chunk):
    """Apply ``fn`` (pytree-of-arrays valued, leading axis = points) over
    ``points`` (N, 3) in fixed-size padded chunks — the reference's
    ``chunk_batch(..., export.chunk_size, ...)`` role for vertex-attribute
    evaluation at export time (reference models/nerf.py:156,
    models/neus.py:317). One XLA compilation regardless of N.

    Self-healing on device OOM: the reference's 2M-point default chunk can
    RESOURCE_EXHAUST a chip when ``fn`` is the analytic-gradient vertex
    color eval (jac + per-level gather transients at DTU mesh sizes, with
    the train state still resident); the chunk halves and the sweep
    restarts (each attempt is ~1-2 min, losing partial progress is cheap
    next to losing the whole export at step 20k)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    chunk = int(chunk)
    while True:
        try:
            return _chunk_sweep(fn, points, n, chunk)
        except Exception as e:  # jax runtime errors don't share one type
            if "RESOURCE_EXHAUSTED" not in str(e) or chunk <= 4096:
                raise
            chunk //= 2
            print(
                f"[export] point eval RESOURCE_EXHAUSTED — retrying at "
                f"chunk={chunk}",
                flush=True,
            )


def _chunk_sweep(fn, points, n, chunk):
    if n <= chunk:
        return fn(jnp.asarray(points))
    outs = []
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        block = points[start:end]
        if block.shape[0] < chunk:
            block = np.concatenate(
                [block, np.zeros((chunk - block.shape[0], 3), np.float32)]
            )
        out = fn(jnp.asarray(block))
        outs.append(
            jax.tree_util.tree_map(lambda a, k=end - start: np.asarray(a)[:k], out)
        )
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *outs
    )


def _extract(values, vmin, vmax, iso=0.0):
    if _native.native_available():
        verts, faces = _native.marching_tetrahedra_native(values, iso)
    else:
        verts, faces = marching_tetrahedra(values, iso)
    res = np.asarray(values.shape, np.float32)
    scale = (np.asarray(vmax) - np.asarray(vmin)) / np.maximum(res - 1.0, 1.0)
    v_world = verts * scale[None, :] + np.asarray(vmin, np.float32)[None, :]
    return {"v_pos": v_world.astype(np.float32), "t_pos_idx": faces}


def extract_isosurface(geometry, params, step=None):
    """Two-stage extraction (coarse full-cube pass -> padded-bbox fine pass).

    ``geometry`` must expose ``forward_level(params, points, step)`` (negative
    inside) and carry ``radius`` + ``config.isosurface`` with ``resolution``
    and optional ``chunk``.
    """
    iso_cfg = geometry.config.get("isosurface", None)
    if iso_cfg is None:
        raise ValueError("geometry config has no `isosurface` section")
    resolution = int(iso_cfg["resolution"])
    chunk = int(iso_cfg.get("chunk", 2097152))
    # surface at level == -threshold: the density geometry exposes
    # level = -density and configs set e.g. threshold: 5.0
    # (reference models/geometry.py:95-96 + configs/nerf-blender.yaml:40)
    iso = -float(iso_cfg.get("threshold", 0.0))
    r = float(geometry.radius)

    vmin = np.array([-r, -r, -r], np.float32)
    vmax = np.array([r, r, r], np.float32)
    coarse_vals = _eval_level_grid(
        geometry, params, vmin, vmax, resolution, chunk, step=step
    )
    coarse = _extract(coarse_vals, vmin, vmax, iso=iso)
    if coarse["v_pos"].shape[0] == 0:
        return coarse

    # fine pass over the 10%-padded coarse bbox (reference models/geometry.py:106-111)
    c_min = coarse["v_pos"].min(axis=0)
    c_max = coarse["v_pos"].max(axis=0)
    pad = 0.1 * (c_max - c_min)
    f_min = np.maximum(c_min - pad, vmin)
    f_max = np.minimum(c_max + pad, vmax)
    fine_vals = _eval_level_grid(
        geometry, params, f_min, f_max, resolution, chunk, step=step
    )
    return _extract(fine_vals, f_min, f_max, iso=iso)
