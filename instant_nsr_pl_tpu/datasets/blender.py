"""NeRF-Synthetic (Blender) dataset.

Re-implements the reference's datasets/blender.py (BlenderDatasetBase at
27-85): parses ``transforms_{split}.json``, focal from ``camera_angle_x``,
loads RGBA pngs (alpha becomes the fg mask), shares one per-pixel direction
grid across views. Arrays stay in host numpy; the system moves them to device
once in ``setup_data`` (the TPU analog of the reference's GPU-resident
dataset, datasets/blender.py:68-71).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from instant_nsr_pl_tpu.registry import datasets
from instant_nsr_pl_tpu.ops.ray import get_ray_directions


class BlenderDatasetBase:
    def setup(self, config, split):
        self.config = config
        self.split = split

        with open(
            os.path.join(config.root_dir, f"transforms_{split}.json")
        ) as f:
            meta = json.load(f)

        if "w" in meta and "h" in meta:
            W, H = int(meta["w"]), int(meta["h"])
        else:
            W, H = 800, 800

        if "img_wh" in config:
            w, h = tuple(config["img_wh"])
        elif "img_downscale" in config:
            w, h = W // int(config.img_downscale), H // int(config.img_downscale)
        else:
            raise ValueError("specify img_wh or img_downscale")
        assert round(W / w * h) == H, "aspect ratio must be preserved"

        self.w, self.h = w, h
        self.img_wh = (w, h)
        self.near, self.far = float(config.get("near_plane", 2.0)), float(
            config.get("far_plane", 6.0)
        )
        self.focal = 0.5 * w / math.tan(0.5 * float(meta["camera_angle_x"]))

        self.has_mask = True
        self.apply_mask = True

        # shared direction grid (intrinsics identical across views)
        self.directions = get_ray_directions(
            w, h, self.focal, self.focal, w / 2, h / 2
        )

        from PIL import Image

        c2w_list, img_list, mask_list = [], [], []
        for frame in meta["frames"]:
            c2w = np.array(frame["transform_matrix"], np.float32)[:3, :4]
            c2w_list.append(c2w)
            img_path = os.path.join(
                config.root_dir, f"{frame['file_path']}.png"
            )
            img = Image.open(img_path)
            if img.size != (w, h):
                img = img.resize((w, h), Image.BICUBIC)
            img = np.asarray(img, np.float32) / 255.0  # (h, w, 4)
            if img.shape[-1] == 4:
                mask = img[..., 3]
                rgb = img[..., :3]
            else:
                mask = np.ones(img.shape[:2], np.float32)
                rgb = img[..., :3]
            img_list.append(rgb)
            mask_list.append(mask)

        self.all_c2w = np.stack(c2w_list)
        self.all_images = np.stack(img_list)
        self.all_fg_masks = np.stack(mask_list)


@datasets.register("blender")
class BlenderDataModule:
    """Split container mirroring the reference's LightningDataModule surface
    (datasets/blender.py:96-135) without the torch DataLoader machinery —
    ray batching happens on device inside the system."""

    def __init__(self, config):
        self.config = config
        self._splits = {}

    def setup(self, stage=None):
        cfg = self.config
        wanted = {
            "fit": [cfg.get("train_split", "train"), cfg.get("val_split", "val")],
            "validate": [cfg.get("val_split", "val")],
            "test": [cfg.get("test_split", "test")],
            # reference predict renders the TRAIN split's views
            # (datasets/blender.py:109-110)
            "predict": [cfg.get("train_split", "train")],
        }.get(stage or "fit")
        for split in wanted:
            if split not in self._splits:
                ds = BlenderDatasetBase()
                ds.setup(cfg, split)
                self._splits[split] = ds

    def split(self, name):
        return self._splits[name]

    @property
    def train(self):
        return self._splits[self.config.get("train_split", "train")]

    @property
    def val(self):
        return self._splits[self.config.get("val_split", "val")]

    @property
    def test(self):
        return self._splits[self.config.get("test_split", "test")]

    @property
    def predict(self):
        return self._splits[self.config.get("train_split", "train")]
