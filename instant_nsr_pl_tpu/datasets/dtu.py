"""DTU multi-view stereo dataset (NeuS preprocessing).

Re-implements the reference's datasets/dtu.py behavior: ``cameras_sphere.npz``
holds per-view ``world_mat_i`` (projection) and ``scale_mat_i`` (the
normalization that puts the object in the unit sphere); the product is
decomposed into intrinsics + pose with cv2, and the NeuS (right-down-front)
camera is flipped into OpenGL (right-up-back) convention
(reference datasets/dtu.py:20-34,100-106). Per-view direction grids are kept
because intrinsics vary. The test split renders a synthetic spheric
trajectory through the camera cloud — its GT frames are zeros, which is why
the reference calls test PSNR "meaningless" for DTU (README.md:67).
"""

from __future__ import annotations

import math
import os

import numpy as np

from instant_nsr_pl_tpu.registry import datasets
from instant_nsr_pl_tpu.ops.ray import get_ray_directions


def load_K_Rt_from_P(P):
    """Decompose a 3x4 projection into (intrinsics 4x4, c2w pose 4x4)."""
    import cv2

    K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def create_spheric_poses(cam_positions, n_steps=120):
    """Circular c2w trajectory through the camera cloud looking at the
    origin (reference datasets/dtu.py:36-56)."""
    cams = np.asarray(cam_positions, np.float64)
    center = np.zeros(3)
    mean = cams.mean(0)
    cam_center = mean / np.linalg.norm(mean) * np.linalg.norm(mean)
    eigvals, eigvecs = np.linalg.eig(cams.T @ cams)
    rot_axis = np.real(eigvecs[:, 1])
    rot_axis = rot_axis / np.linalg.norm(rot_axis)
    up = rot_axis
    rot_dir = np.cross(rot_axis, cam_center)
    unit_cams = cams / np.linalg.norm(cams, axis=-1, keepdims=True)
    unit_c = cam_center / np.linalg.norm(cam_center)
    max_angle = np.arccos(np.clip((unit_cams * unit_c).sum(-1), -1, 1)).max()

    all_c2w = []
    for theta in np.linspace(-max_angle, max_angle, n_steps):
        pos = cam_center * math.cos(theta) + rot_dir * math.sin(theta)
        look = center - pos
        look = look / np.linalg.norm(look)
        s = np.cross(look, up)
        s = s / np.linalg.norm(s)
        u = np.cross(s, look)
        u = u / np.linalg.norm(u)
        c2w = np.concatenate(
            [np.stack([s, u, -look], axis=1), pos[:, None]], axis=1
        )
        all_c2w.append(c2w.astype(np.float32))
    return np.stack(all_c2w)


class DTUDatasetBase:
    def setup(self, config, split):
        import cv2
        from PIL import Image

        self.config = config
        self.split = split

        cams = np.load(os.path.join(config.root_dir, config.get("cameras_file", "cameras_sphere.npz")))

        img_sample = cv2.imread(os.path.join(config.root_dir, "image", "000000.png"))
        H, W = img_sample.shape[0], img_sample.shape[1]
        if "img_wh" in config:
            w, h = tuple(config["img_wh"])
            assert round(W / w * h) == H
        elif "img_downscale" in config:
            d = float(config.img_downscale)
            w, h = int(W / d + 0.5), int(H / d + 0.5)
        else:
            raise ValueError("specify img_wh or img_downscale")
        self.w, self.h = w, h
        self.img_wh = (w, h)
        factor = w / W

        self.has_mask = True
        self.apply_mask = bool(config.get("apply_mask", True))

        n_images = max(int(k.split("_")[-1]) for k in cams.keys()) + 1

        directions, all_c2w, images, masks = [], [], [], []
        for i in range(n_images):
            P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"])[:3, :4]
            K, c2w = load_K_Rt_from_P(P)
            fx, fy = K[0, 0] * factor, K[1, 1] * factor
            cx, cy = K[0, 2] * factor, K[1, 2] * factor
            directions.append(get_ray_directions(w, h, fx, fy, cx, cy))
            # NeuS DTU (right-down-front) -> OpenGL (right-up-back)
            c2w = c2w.copy()
            c2w[:3, 1:3] *= -1.0
            all_c2w.append(c2w[:3, :4])

            if split in ("train", "val"):
                if split == "val" and i == 0:
                    # reference-faithful behavior (reference datasets/dtu.py
                    # val split loads the training images), but say so loudly:
                    # "val PSNR" on DTU runs is train-set PSNR.
                    print(
                        "[dtu] note: the val split aliases the TRAINING "
                        "images (reference behavior) — val metrics are "
                        "train-set metrics",
                        flush=True,
                    )
                img = Image.open(
                    os.path.join(config.root_dir, "image", f"{i:06d}.png")
                ).resize(self.img_wh, Image.BICUBIC)
                images.append(np.asarray(img, np.float32)[..., :3] / 255.0)
                mask = Image.open(
                    os.path.join(config.root_dir, "mask", f"{i:03d}.png")
                ).convert("L").resize(self.img_wh, Image.BICUBIC)
                masks.append(np.asarray(mask, np.float32) / 255.0)

        self.all_c2w = np.stack(all_c2w)
        if split == "test":
            n_steps = int(config.get("n_test_traj_steps", 60))
            self.all_c2w = create_spheric_poses(self.all_c2w[:, :, 3], n_steps)
            self.all_images = np.zeros((n_steps, h, w, 3), np.float32)
            self.all_fg_masks = np.zeros((n_steps, h, w), np.float32)
            self.directions = directions[0]
        else:
            self.all_images = np.stack(images)
            self.all_fg_masks = np.stack(masks)
            self.directions = np.stack(directions)


@datasets.register("dtu")
class DTUDataModule:
    def __init__(self, config):
        self.config = config
        self._splits = {}

    def setup(self, stage=None):
        wanted = {
            "fit": ["train", "val"],
            "validate": ["val"],
            "test": ["test"],
            # reference predict renders the TRAIN split (dtu.py:175-176)
            "predict": ["train"],
        }.get(stage or "fit")
        for split in wanted:
            if split not in self._splits:
                ds = DTUDatasetBase()
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
