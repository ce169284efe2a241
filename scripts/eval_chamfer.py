"""Chamfer distance of an exported mesh vs the procedural scene's ANALYTIC
surface (the union of spheres in datasets/synthetic.py).

The reference publishes no chamfer numbers and ships no eval code for it
(BASELINE.md caveats); the driver targets "DTU NeuS at reference chamfer",
so this records the quality-session mesh evidence the reference cannot:
the procedural scene has an exact surface, making chamfer exact rather
than scan-limited.

Directions:
  mesh -> surface: mean |unsigned distance| of area-weighted mesh samples
    (for a union of spheres, min_i ||p - c_i| - r_i| is the exact
    unsigned distance for points outside every *other* sphere; mesh
    points lie near the surface, where it is exact).
  surface -> mesh: mean NN distance from exact surface samples (per-sphere
    area-weighted, points inside another sphere rejected) to mesh samples.

Usage: python scripts/eval_chamfer.py --exp_dir <dir>  (newest .obj under
<dir>/save), or --mesh path.obj. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from instant_nsr_pl_tpu.datasets.synthetic import _DEFAULT_SPHERES  # noqa: E402
from instant_nsr_pl_tpu.utils.chamfer import sample_mesh_surface  # noqa: E402
from instant_nsr_pl_tpu.utils.savers import load_obj  # noqa: E402


def surface_samples(spheres, n_per_sphere=60000, seed=0):
    """Exact area-weighted samples of the union-of-spheres surface."""
    rng = np.random.RandomState(seed)
    pts = []
    for ci, (c, r, _a) in enumerate(spheres):
        d = rng.normal(size=(n_per_sphere, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        p = np.asarray(c)[None] + r * d
        keep = np.ones(len(p), bool)
        for cj, (c2, r2, _a2) in enumerate(spheres):
            if cj != ci:
                keep &= np.linalg.norm(p - np.asarray(c2)[None], axis=1) >= r2
        pts.append(p[keep])
    return np.concatenate(pts, axis=0)


def unsigned_distance(points, spheres):
    """Exact unsigned distance to the union surface near the surface."""
    d = np.full(len(points), np.inf)
    for c, r, _a in spheres:
        d = np.minimum(d, np.abs(np.linalg.norm(points - np.asarray(c)[None], axis=1) - r))
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", default=None)
    p.add_argument("--mesh", default=None)
    p.add_argument("--n_points", type=int, default=100000)
    args = p.parse_args()

    mesh_path = args.mesh
    if mesh_path is None:
        assert args.exp_dir, "need --exp_dir or --mesh"
        objs = sorted(
            glob.glob(
                os.path.join(args.exp_dir, "**", "save", "*.obj"),
                recursive=True,
            )
            + glob.glob(os.path.join(args.exp_dir, "save", "*.obj")),
            key=os.path.getmtime,
        )
        assert objs, f"no .obj under {args.exp_dir}/**/save"
        mesh_path = objs[-1]

    mesh = load_obj(mesh_path)
    mesh_pts = sample_mesh_surface(
        mesh["v_pos"], mesh["t_pos_idx"], n_points=args.n_points
    )
    # honor a dataset.spheres scene override from the experiment's
    # snapshotted config (synthetic._spheres_from_config) — chamfer against
    # the wrong analytic surface would be silently meaningless
    spheres = _DEFAULT_SPHERES
    if args.exp_dir:
        parsed = glob.glob(
            os.path.join(args.exp_dir, "**", "config", "parsed.yaml"),
            recursive=True,
        )
        if parsed:
            from instant_nsr_pl_tpu.config import load_config

            ds = load_config(sorted(parsed)[-1]).dataset
            if "spheres" in ds:
                spheres = [
                    (tuple(s[:3]), float(s[3]), tuple(s[4:7]))
                    for s in ds["spheres"]
                ]

    d_mesh_to_gt = unsigned_distance(mesh_pts, spheres)

    from scipy.spatial import cKDTree

    gt_pts = surface_samples(spheres)
    tree = cKDTree(mesh_pts)
    d_gt_to_mesh, _ = tree.query(gt_pts, k=1)

    # Exterior-surface variant: cull mesh samples strictly INSIDE the object
    # (signed distance < -tol). SDF methods commonly grow interior shells
    # (zero-crossings inside the solid) that no camera can observe; the
    # standard DTU evaluation culls unobservable points via ObsMask — for
    # an analytic solid, "inside the object" is the exact equivalent.
    sd = np.full(len(mesh_pts), np.inf)
    for c, r, _a in spheres:
        sd = np.minimum(
            sd, np.linalg.norm(mesh_pts - np.asarray(c)[None], axis=1) - r
        )
    ext = sd > -0.01
    d_ext = d_mesh_to_gt[ext]

    out = {
        "mesh": mesh_path,
        "n_mesh_points": int(len(mesh_pts)),
        "chamfer": round(float(0.5 * (d_mesh_to_gt.mean() + d_gt_to_mesh.mean())), 6),
        "mesh_to_gt_mean": round(float(d_mesh_to_gt.mean()), 6),
        "gt_to_mesh_mean": round(float(d_gt_to_mesh.mean()), 6),
        "mesh_to_gt_p95": round(float(np.percentile(d_mesh_to_gt, 95)), 6),
        "gt_to_mesh_p95": round(float(np.percentile(d_gt_to_mesh, 95)), 6),
        "chamfer_exterior": round(
            float(0.5 * (d_ext.mean() + d_gt_to_mesh.mean())), 6
        ),
        "exterior_frac": round(float(ext.mean()), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
