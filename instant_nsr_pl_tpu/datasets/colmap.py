"""COLMAP captures (e.g. MipNeRF-360 unbounded scenes).

Re-implements the reference's datasets/colmap.py behavior in numpy: reads
``sparse/0/{cameras,images,points3D}.bin``, supports SIMPLE_RADIAL / PINHOLE
/ OPENCV intrinsics, normalizes world space (center estimated from cameras /
look-at ray intersections / robust foreground point center; up from the
camera cloud or a RANSAC ground plane — pyransac3d replaced by a small
in-repo RANSAC), rotates up to +z, rescales so the nearest camera sits at
distance 1, and renders tests along a circular spheric path (reference
datasets/colmap.py:20-130,142-268). Poses are cached class-level so
train/val/test share one load (reference colmap.py:133-135).
"""

from __future__ import annotations

import math
import os

import numpy as np

from instant_nsr_pl_tpu.registry import datasets
from instant_nsr_pl_tpu.ops.ray import get_ray_directions
from instant_nsr_pl_tpu.datasets.colmap_utils import (
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)


def _normalize(v, axis=-1):
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def get_center(pts):
    """Robust inlier center (reference datasets/colmap.py:20-27)."""
    center = pts.mean(0)
    dis = np.linalg.norm(pts - center[None, :], axis=-1)
    mean, std = dis.mean(), dis.std()
    q25, q75 = np.quantile(dis, 0.25), np.quantile(dis, 0.75)
    valid = (
        (dis > mean - 1.5 * std)
        & (dis < mean + 1.5 * std)
        & (dis > mean - (q75 - q25) * 1.5)
        & (dis < mean + (q75 - q25) * 1.5)
    )
    return pts[valid].mean(0)


def ransac_plane(pts, thresh=0.01, iters=256, seed=0):
    """Plane (A,B,C,D) with max inliers (the pyransac3d.Plane role)."""
    rng = np.random.RandomState(seed)
    n = pts.shape[0]
    best_eq, best_count = None, -1
    for _ in range(iters):
        ids = rng.choice(n, 3, replace=False)
        p0, p1, p2 = pts[ids]
        normal = np.cross(p1 - p0, p2 - p0)
        nn = np.linalg.norm(normal)
        if nn < 1e-12:
            continue
        normal = normal / nn
        d = -normal.dot(p0)
        dist = np.abs(pts @ normal + d)
        count = int((dist < thresh).sum())
        if count > best_count:
            best_count = count
            best_eq = np.array([*normal, d])
    return best_eq


def normalize_poses(poses, pts, up_est_method, center_est_method):
    """World-space normalization (reference datasets/colmap.py:29-110)."""
    poses = np.asarray(poses, np.float64)
    pts = np.asarray(pts, np.float64)

    if center_est_method == "camera":
        center = poses[..., 3].mean(0)
    elif center_est_method == "lookat":
        # least-squares intersection of consecutive camera-ray pairs
        cams_ori = poses[..., 3]
        cams_dir = _normalize(poses[:, :3, :3] @ np.array([0.0, 0.0, -1.0]))
        rolled_dir = np.roll(cams_dir, 1, axis=0)
        rolled_ori = np.roll(cams_ori, 1, axis=0)
        A = np.stack([cams_dir, -rolled_dir], axis=-1)  # (N, 3, 2)
        b = -cams_ori + rolled_ori
        t = np.stack(
            [np.linalg.lstsq(A[i], b[i], rcond=None)[0] for i in range(len(A))]
        )  # (N, 2)
        inter = (
            np.stack([cams_dir, rolled_dir], axis=-1) * t[:, None, :]
            + np.stack([cams_ori, rolled_ori], axis=-1)
        ).mean(axis=(0, 2))
        center = inter
    elif center_est_method == "point":
        center = poses[..., 3].mean(0)
    else:
        raise ValueError(f"Unknown center estimation method: {center_est_method}")

    if up_est_method == "ground":
        plane_eq = ransac_plane(pts, thresh=0.01)
        z = _normalize(plane_eq[:3])
        signed = np.concatenate([pts, np.ones_like(pts[..., :1])], -1) @ plane_eq
        if signed.mean() < 0:
            z = -z
    elif up_est_method == "camera":
        v = (poses[..., 3] - center).mean(0)
        if np.linalg.norm(v) < 1e-6:
            # perfectly symmetric capture: camera offsets cancel and the
            # reference formula (colmap.py:62) silently normalizes ~0 into
            # garbage — fall back to world +z loudly instead
            import warnings

            warnings.warn(
                "up_est_method=camera degenerated (camera positions are "
                "symmetric about the center); falling back to +z up"
            )
            z = np.array([0.0, 0.0, 1.0])
        else:
            z = _normalize(v, axis=0)
    else:
        raise ValueError(f"Unknown up estimation method: {up_est_method}")

    y_ = np.array([z[1], -z[0], 0.0])
    if np.linalg.norm(y_) < 1e-6:
        # up already aligned with +/-z (symmetric capture): any horizontal
        # axis works (the reference's formula silently degenerates here)
        y_ = np.array([1.0, 0.0, 0.0])
    x = _normalize(np.cross(y_, z), axis=0)
    y = np.cross(z, x)

    def apply(inv_trans, poses, pts):
        homo = np.concatenate(
            [poses, np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]]), (len(poses), 1, 1))],
            axis=1,
        )
        poses_n = (inv_trans @ homo)[:, :3]
        pts_n = (
            inv_trans @ np.concatenate([pts, np.ones_like(pts[:, :1])], -1)[..., None]
        )[:, :3, 0]
        return poses_n, pts_n

    if center_est_method == "point":
        # rotate only, then translate by robust fg-point center, then scale
        Rc = np.stack([x, y, z], axis=1)
        inv = np.eye(4)
        inv[:3, :3] = Rc.T
        poses_n, pts = apply(inv, poses, pts)
        pmin = poses_n[..., 3].min(0)
        pmax = poses_n[..., 3].max(0)
        fg = pts[
            (pmin[0] < pts[:, 0]) & (pts[:, 0] < pmax[0])
            & (pmin[1] < pts[:, 1]) & (pts[:, 1] < pmax[1])
        ]
        center = get_center(fg if len(fg) else pts)
        inv = np.eye(4)
        inv[:3, 3] = -center
        poses_n, pts = apply(inv, poses_n, pts)
    else:
        Rc = np.stack([x, y, z], axis=1)
        inv = np.eye(4)
        inv[:3, :3] = Rc.T
        inv[:3, 3] = (-Rc.T @ center.reshape(3, 1))[:, 0]
        poses_n, pts = apply(inv, poses, pts)

    scale = np.linalg.norm(poses_n[..., 3], axis=-1).min()
    poses_n[..., 3] /= scale
    pts = pts / scale
    return poses_n.astype(np.float32), pts.astype(np.float32)


def create_spheric_poses(cameras, n_steps=120):
    """Circular path at the cameras' mean height/distance looking at the
    origin (reference datasets/colmap.py:112-130)."""
    cams = np.asarray(cameras, np.float64)
    mean_d = np.linalg.norm(cams, axis=-1).mean()
    mean_h = cams[:, 2].mean()
    r = math.sqrt(max(mean_d**2 - mean_h**2, 1e-12))
    up = np.array([0.0, 0.0, 1.0])

    all_c2w = []
    for theta in np.linspace(0, 2 * math.pi, n_steps):
        pos = np.array([r * math.cos(theta), r * math.sin(theta), mean_h])
        look = _normalize(-pos, axis=0)
        s = _normalize(np.cross(look, up), axis=0)
        u = _normalize(np.cross(s, look), axis=0)
        c2w = np.concatenate([np.stack([s, u, -look], 1), pos[:, None]], axis=1)
        all_c2w.append(c2w.astype(np.float32))
    return np.stack(all_c2w)


class ColmapDatasetBase:
    # one parse + normalization shared by all splits (reference colmap.py:133-135)
    _cache = {}

    def setup(self, config, split):
        from PIL import Image

        self.config = config
        self.split = split
        cache_key = str(config.root_dir)

        if cache_key not in ColmapDatasetBase._cache:
            camdata = read_cameras_binary(
                os.path.join(config.root_dir, "sparse/0/cameras.bin")
            )
            cam = camdata[min(camdata.keys())]
            H, W = int(cam.height), int(cam.width)
            if "img_wh" in config:
                w, h = tuple(config["img_wh"])
                assert round(W / w * h) == H
            elif "img_downscale" in config:
                d = float(config.img_downscale)
                w, h = int(W / d + 0.5), int(H / d + 0.5)
            else:
                raise ValueError("specify img_wh or img_downscale")
            factor = w / W

            if cam.model == "SIMPLE_RADIAL":
                fx = fy = cam.params[0] * factor
                cx, cy = cam.params[1] * factor, cam.params[2] * factor
            elif cam.model in ("PINHOLE", "OPENCV"):
                fx, fy = cam.params[0] * factor, cam.params[1] * factor
                cx, cy = cam.params[2] * factor, cam.params[3] * factor
            else:
                raise ValueError(f"Unsupported camera model {cam.model}")
            directions = get_ray_directions(w, h, fx, fy, cx, cy)

            imdata = read_images_binary(
                os.path.join(config.root_dir, "sparse/0/images.bin")
            )
            mask_dir = os.path.join(config.root_dir, "masks")
            has_mask = os.path.exists(mask_dir)
            apply_mask = has_mask and bool(config.get("apply_mask", False))

            all_c2w, images, masks = [], [], []
            for d in imdata.values():
                R = qvec2rotmat(d.qvec)
                t = d.tvec.reshape(3, 1)
                c2w = np.concatenate([R.T, -R.T @ t], axis=1).astype(np.float32)
                c2w[:, 1:3] *= -1.0  # COLMAP -> OpenGL
                all_c2w.append(c2w)

                img = Image.open(
                    os.path.join(config.root_dir, "images", d.name)
                ).resize((w, h), Image.BICUBIC)
                images.append(np.asarray(img, np.float32)[..., :3] / 255.0)
                if has_mask:
                    cands = [
                        os.path.join(mask_dir, d.name),
                        os.path.join(mask_dir, d.name[3:]),
                    ]
                    cands = [p for p in cands if os.path.exists(p)]
                    m = Image.open(cands[0]).convert("L").resize((w, h), Image.BICUBIC)
                    masks.append(np.asarray(m, np.float32) / 255.0)
                else:
                    masks.append(np.ones((h, w), np.float32))

            all_c2w = np.stack(all_c2w)
            pts3d_map = read_points3d_binary(
                os.path.join(config.root_dir, "sparse/0/points3D.bin")
            )
            pts3d = np.array([p.xyz for p in pts3d_map.values()], np.float32)
            all_c2w, pts3d = normalize_poses(
                all_c2w,
                pts3d,
                up_est_method=config.up_est_method,
                center_est_method=config.center_est_method,
            )

            ColmapDatasetBase._cache[cache_key] = {
                "w": w, "h": h, "factor": factor,
                "has_mask": has_mask, "apply_mask": apply_mask,
                "directions": directions, "pts3d": pts3d,
                "all_c2w": all_c2w,
                "all_images": np.stack(images),
                "all_fg_masks": np.stack(masks),
            }

        props = ColmapDatasetBase._cache[cache_key]
        for k, v in props.items():
            setattr(self, k, v)
        self.img_wh = (self.w, self.h)

        if split == "val":
            # reference-faithful: colmap has no held-out split (reference
            # datasets/colmap.py shares all images); flag it loudly.
            print(
                "[colmap] note: the val split aliases the TRAINING images "
                "(reference behavior) — val metrics are train-set metrics",
                flush=True,
            )
        if split == "test":
            n_steps = int(config.get("n_test_traj_steps", 120))
            self.all_c2w = create_spheric_poses(props["all_c2w"][:, :, 3], n_steps)
            self.all_images = np.zeros((n_steps, self.h, self.w, 3), np.float32)
            self.all_fg_masks = np.zeros((n_steps, self.h, self.w), np.float32)


@datasets.register("colmap")
class ColmapDataModule:
    def __init__(self, config):
        self.config = config
        self._splits = {}

    def setup(self, stage=None):
        wanted = {
            "fit": ["train", "val"],
            "validate": ["val"],
            "test": ["test"],
            # reference predict renders the TRAIN split (colmap.py:306-307)
            "predict": ["train"],
        }.get(stage or "fit")
        for split in wanted:
            if split not in self._splits:
                ds = ColmapDatasetBase()
                ds.setup(self.config, split)
                self._splits[split] = ds

    def split(self, name):
        return self._splits[name]

    @property
    def train(self):
        return self._splits["train"]

    @property
    def val(self):
        return self._splits["val"]

    @property
    def test(self):
        return self._splits["test"]

    @property
    def predict(self):
        return self._splits["train"]
