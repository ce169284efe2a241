"""Export the procedural sphere scene as on-disk datasets in the reference's
input formats, so the real loaders (datasets/blender.py, datasets/dtu.py) can
be driven end-to-end through ``launch.py`` without downloaded data.

Formats produced (both consumed by the unmodified reference configs):

- **blender** (NeRF-Synthetic layout, reference datasets/blender.py:27-48):
  ``transforms_{train,val,test}.json`` with ``camera_angle_x`` + 4x4 OpenGL
  ``transform_matrix`` per frame, RGBA pngs whose alpha is the fg mask.
- **dtu** (NeuS preprocessing layout, reference datasets/dtu.py:20-34):
  ``cameras_sphere.npz`` with per-view ``world_mat_i`` (K @ w2c in the NeuS
  right-down-front convention) and identity ``scale_mat_i`` (the scene is
  already inside the unit sphere), ``image/%06d.png`` + ``mask/%03d.png``.

Usage:
  python scripts/make_synthetic_data.py --out /tmp/nsr_data \
      [--format all|blender|dtu] [--size 128] [--n-train 20] [--n-val 2]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from instant_nsr_pl_tpu.datasets.synthetic import SyntheticDatasetBase  # noqa: E402
from instant_nsr_pl_tpu.config import config_from_dict  # noqa: E402


def _splits(size, n_train, n_val, n_test, fov):
    cfg = config_from_dict(
        {
            "size": size,
            "n_train": n_train,
            "n_val": n_val,
            "n_test": n_test,
            "fov": fov,
        }
    )
    out = {}
    for split in ("train", "val", "test"):
        ds = SyntheticDatasetBase()
        ds.setup(cfg, split)
        out[split] = ds
    return out


def export_blender(root, splits, fov):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    for split, ds in splits.items():
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for i in range(ds.all_images.shape[0]):
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :4] = ds.all_c2w[i]
            frames.append(
                {
                    "file_path": f"./{split}/r_{i}",
                    "transform_matrix": c2w.tolist(),
                }
            )
            rgb = (np.clip(ds.all_images[i], 0, 1) * 255).astype(np.uint8)
            alpha = (np.clip(ds.all_fg_masks[i], 0, 1) * 255).astype(np.uint8)
            rgba = np.concatenate([rgb, alpha[..., None]], axis=-1)
            Image.fromarray(rgba).save(
                os.path.join(root, split, f"r_{i}.png")
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fov, "frames": frames}, f)
    print(f"[blender] wrote {root}")


def export_dtu(root, splits):
    """DTU layout uses ONE image set (the reference aliases val to train);
    we export the train split's views."""
    from PIL import Image

    ds = splits["train"]
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    os.makedirs(os.path.join(root, "mask"), exist_ok=True)
    h, w = ds.all_images.shape[1:3]
    focal = 0.5 * w / math.tan(0.5 * float(ds.config.get("fov", 0.8)))
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float64
    )
    cams = {}
    for i in range(ds.all_images.shape[0]):
        c2w = np.eye(4, dtype=np.float64)
        c2w[:3, :4] = ds.all_c2w[i]
        # OpenGL (right-up-back) -> NeuS DTU convention (right-down-front):
        # the loader flips back with c2w[:3, 1:3] *= -1
        c2w[:3, 1:3] *= -1.0
        w2c = np.linalg.inv(c2w)
        P = np.eye(4, dtype=np.float64)
        P[:3, :4] = K @ w2c[:3, :4]
        cams[f"world_mat_{i}"] = P
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float64)
        rgb = (np.clip(ds.all_images[i], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(
            os.path.join(root, "image", f"{i:06d}.png")
        )
        mask = (np.clip(ds.all_fg_masks[i], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(mask, mode="L").save(
            os.path.join(root, "mask", f"{i:03d}.png")
        )
    np.savez(os.path.join(root, "cameras_sphere.npz"), **cams)
    print(f"[dtu] wrote {root}")


def export_colmap(root, splits, fov):
    """COLMAP sparse-reconstruction layout (reference datasets/colmap.py:
    143-208): ``sparse/0/{cameras,images,points3D}.bin`` + ``images/``.
    One shared PINHOLE camera; 3D points sampled on the analytic sphere
    surfaces (foreground points for the `point` center estimator)."""
    import struct

    from PIL import Image

    from instant_nsr_pl_tpu.datasets.synthetic import _DEFAULT_SPHERES

    ds = splits["train"]
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    h, w = ds.all_images.shape[1:3]
    focal = 0.5 * w / math.tan(0.5 * fov)

    with open(os.path.join(root, "sparse/0/cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))  # PINHOLE model id=1
        f.write(struct.pack("<4d", focal, focal, w / 2.0, h / 2.0))

    def rotmat_to_qvec(R):
        qw = math.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 0.0)) / 2.0
        return np.array(
            [
                qw,
                (R[2, 1] - R[1, 2]) / (4 * qw),
                (R[0, 2] - R[2, 0]) / (4 * qw),
                (R[1, 0] - R[0, 1]) / (4 * qw),
            ]
        )

    with open(os.path.join(root, "sparse/0/images.bin"), "wb") as f:
        f.write(struct.pack("<Q", ds.all_images.shape[0]))
        for i in range(ds.all_images.shape[0]):
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :4] = ds.all_c2w[i]
            # OpenGL (right-up-back) -> COLMAP (right-down-front) then w2c
            c2w[:3, 1:3] *= -1.0
            w2c = np.linalg.inv(c2w)
            q = rotmat_to_qvec(w2c[:3, :3])
            t = w2c[:3, 3]
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i:04d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            rgb = (np.clip(ds.all_images[i], 0, 1) * 255).astype(np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(root, "images", f"img_{i:04d}.png")
            )

    rng = np.random.RandomState(0)
    pts = []
    for (c, r, _a) in _DEFAULT_SPHERES:
        d = rng.randn(120, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts.append(np.asarray(c) + r * d)
    pts = np.concatenate(pts, axis=0)
    with open(os.path.join(root, "sparse/0/points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<QdddBBBd", i, *p, 128, 128, 128, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    print(f"[colmap] wrote {root}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument(
        "--format", default="all", choices=("all", "blender", "dtu", "colmap")
    )
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--n-train", type=int, default=20)
    p.add_argument("--n-val", type=int, default=2)
    p.add_argument("--n-test", type=int, default=4)
    p.add_argument("--fov", type=float, default=0.8)
    args = p.parse_args()

    splits = _splits(args.size, args.n_train, args.n_val, args.n_test, args.fov)
    if args.format in ("all", "blender"):
        export_blender(os.path.join(args.out, "blender"), splits, args.fov)
    if args.format in ("all", "dtu"):
        export_dtu(os.path.join(args.out, "dtu"), splits)
    if args.format in ("all", "colmap"):
        export_colmap(os.path.join(args.out, "colmap"), splits, args.fov)


if __name__ == "__main__":
    main()
