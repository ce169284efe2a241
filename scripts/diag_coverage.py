#!/usr/bin/env python
"""Diagnose the nerf_hash test-PSNR collapse (round-3 PERF.md: val 37.92 vs
test 30.93) WITHOUT a 2-hour retrain: quantify how much of the space the
test rays traverse is never seen by any train ray.

Mechanism under test: hash-table collisions transfer gradient updates from
observed cells into unobserved cells (they share table rows), so density in
never-traversed cells is arbitrary; the occupancy grid then keeps any such
cell whose noise density clears the threshold, and a test ray crossing it
composites a floater. CP's global low-rank factors receive gradients along
whole coordinate lines instead, which regularizes unobserved cells — the
round-3 quality table (CP test 39.21 vs hash 30.93 on the same scene) is
consistent with that. This script measures the geometric precondition:
unobserved-cell exposure along test rays vs val rays.

Usage: python scripts/diag_coverage.py [--root data/blender] [--res 128]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _load_split(root, split):
    from instant_nsr_pl_tpu.config import config_from_dict
    from instant_nsr_pl_tpu.datasets.blender import BlenderDatasetBase

    ds = BlenderDatasetBase()
    ds.setup(
        config_from_dict(
            {"root_dir": root, "img_downscale": 4}
        ),
        split,
    )
    return ds


def visited_cells(ds, res, radius, rays_per_view, seed, step_frac=0.5):
    """Bool (res^3,) — cells traversed by sampled rays of every view."""
    rng = np.random.default_rng(seed)
    h, w = ds.directions.shape[:2]
    dirs = np.asarray(ds.directions).reshape(-1, 3)
    vis = np.zeros(res * res * res, dtype=bool)
    cell = 2.0 * radius / res
    step = cell * step_frac
    n_steps = int(np.ceil(2.0 * radius * np.sqrt(3) / step))
    ts = (np.arange(n_steps) + 0.5) * step
    for c2w in np.asarray(ds.all_c2w):
        sel = rng.choice(h * w, size=min(rays_per_view, h * w), replace=False)
        d = dirs[sel] @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[:3, 3]
        # slab AABB intersect
        inv = 1.0 / np.where(np.abs(d) < 1e-9, 1e-9, d)
        t0 = (-radius - o) * inv
        t1 = (radius - o) * inv
        tmin = np.minimum(t0, t1).max(axis=-1).clip(min=0.0)
        tmax = np.maximum(t0, t1).min(axis=-1)
        hit = tmax > tmin
        d, tmin, tmax = d[hit], tmin[hit], tmax[hit]
        p = o[None, None] + d[:, None] * (tmin[:, None] + ts[None])[..., None]
        ok = (ts[None] + tmin[:, None]) < tmax[:, None]
        idx = np.floor((p + radius) / cell).astype(np.int64)
        inside = ok & (idx >= 0).all(-1) & (idx < res).all(-1)
        flat = idx[..., 0] + idx[..., 1] * res + idx[..., 2] * res * res
        vis[np.unique(flat[inside])] = True
    return vis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/blender")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--radius", type=float, default=1.5)
    ap.add_argument("--rays-per-view", type=int, default=20000)
    args = ap.parse_args()

    train = _load_split(args.root, "train")
    val = _load_split(args.root, "val")
    test = _load_split(args.root, "test")
    print(
        f"views: train={len(train.all_c2w)} val={len(val.all_c2w)} "
        f"test={len(test.all_c2w)}"
    )

    kw = dict(res=args.res, radius=args.radius,
              rays_per_view=args.rays_per_view)
    tr = visited_cells(train, seed=0, **kw)
    va = visited_cells(val, seed=1, **kw)
    te = visited_cells(test, seed=2, **kw)

    out = {"res": args.res, "train_cells": int(tr.sum())}
    for name, v in (("val", va), ("test", te)):
        unseen = v & ~tr
        out[f"{name}_cells"] = int(v.sum())
        out[f"{name}_unseen_cells"] = int(unseen.sum())
        out[f"{name}_unseen_frac"] = float(unseen.sum() / max(v.sum(), 1))
    print(json.dumps(out, indent=2))

    # per-test-view exposure (which views are hurt)
    for i in range(len(test.all_c2w)):
        one = _load_split(args.root, "test")
        one.all_c2w = one.all_c2w[i : i + 1]
        v = visited_cells(one, seed=10 + i, **kw)
        unseen = v & ~tr
        print(
            f"test view {i}: cells={int(v.sum())} "
            f"unseen={int(unseen.sum())} "
            f"frac={unseen.sum() / max(v.sum(), 1):.4f}"
        )


if __name__ == "__main__":
    main()
