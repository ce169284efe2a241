"""Dataset loader tests against generated on-disk fixtures: blender
(transforms json + RGBA pngs), DTU (cameras_sphere.npz + image/mask dirs) and
COLMAP (binary sparse model round-trip + pose normalization invariants)."""

import json
import math
import os
import struct

import numpy as np
import pytest

from instant_nsr_pl_tpu.config import config_from_dict
from instant_nsr_pl_tpu.registry import datasets
import instant_nsr_pl_tpu.datasets  # noqa: F401


# ---------------------------------------------------------------------------
# blender
# ---------------------------------------------------------------------------


@pytest.fixture
def blender_root(tmp_path):
    from PIL import Image

    root = tmp_path / "lego"
    root.mkdir()
    rng = np.random.RandomState(0)
    for split, n in (("train", 3), ("val", 2)):
        frames = []
        (root / split).mkdir()
        for i in range(n):
            name = f"./{split}/r_{i}"
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 4 + i]
            frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
            img = rng.randint(0, 255, (16, 16, 4), np.uint8)
            Image.fromarray(img).save(root / split / f"r_{i}.png")
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return str(root)


def test_blender_loader(blender_root):
    cfg = config_from_dict(
        {"name": "blender", "root_dir": blender_root, "img_wh": [16, 16]}
    )
    dm = datasets.make("blender", cfg)
    dm.setup("fit")
    tr = dm.train
    assert tr.all_images.shape == (3, 16, 16, 3)
    assert tr.all_fg_masks.shape == (3, 16, 16)
    assert tr.all_c2w.shape == (3, 3, 4)
    assert tr.directions.shape == (16, 16, 3)
    # focal from camera_angle_x
    expected_focal = 0.5 * 16 / math.tan(0.4)
    assert abs(tr.focal - expected_focal) < 1e-4
    assert tr.has_mask and tr.apply_mask
    # center pixel looks along -z
    d = tr.directions[8, 8]
    assert d[2] == -1.0


# ---------------------------------------------------------------------------
# DTU
# ---------------------------------------------------------------------------


@pytest.fixture
def dtu_root(tmp_path):
    import cv2

    root = tmp_path / "dtu_scan"
    (root / "image").mkdir(parents=True)
    (root / "mask").mkdir()
    rng = np.random.RandomState(0)
    n = 4
    cams = {}
    K = np.array([[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]])
    for i in range(n):
        theta = 2 * math.pi * i / n
        pos = np.array([2 * math.cos(theta), 2 * math.sin(theta), 1.0])
        forward = -pos / np.linalg.norm(pos)
        right = np.cross(forward, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        R_w2c = np.stack([right, down, forward], axis=0)  # right-down-front
        t = -R_w2c @ pos
        P = K @ np.concatenate([R_w2c, t[:, None]], axis=1)
        world_mat = np.eye(4)
        world_mat[:3, :4] = P
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4)
        cv2.imwrite(str(root / "image" / f"{i:06d}.png"),
                    rng.randint(0, 255, (16, 16, 3), np.uint8))
        cv2.imwrite(str(root / "mask" / f"{i:03d}.png"),
                    (rng.rand(16, 16) > 0.5).astype(np.uint8) * 255)
    np.savez(root / "cameras_sphere.npz", **cams)
    return str(root)


def test_dtu_loader(dtu_root):
    cfg = config_from_dict(
        {
            "name": "dtu",
            "root_dir": dtu_root,
            "cameras_file": "cameras_sphere.npz",
            "img_downscale": 1,
            "n_test_traj_steps": 6,
            "apply_mask": True,
        }
    )
    dm = datasets.make("dtu", cfg)
    dm.setup("fit")
    tr = dm.train
    assert tr.all_images.shape == (4, 16, 16, 3)
    assert tr.directions.shape == (4, 16, 16, 3)  # per-view intrinsics
    # recovered camera centers on the r=2 ring
    centers = tr.all_c2w[:, :, 3]
    np.testing.assert_allclose(
        np.linalg.norm(centers[:, :2], axis=1), 2.0, atol=1e-3
    )
    # OpenGL convention: camera -z axis points at the origin
    fwd = -tr.all_c2w[:, :, 2]
    look = -centers / np.linalg.norm(centers, axis=1, keepdims=True)
    assert (fwd * look).sum(-1).min() > 0.9

    dm.setup("test")
    te = dm.test
    assert te.all_c2w.shape == (6, 3, 4)
    assert te.all_images.shape == (6, 16, 16, 3)
    assert float(te.all_images.sum()) == 0.0  # blank GT (PSNR meaningless)


# ---------------------------------------------------------------------------
# COLMAP
# ---------------------------------------------------------------------------


def _write_colmap_model(root, n_cams=6):
    """Binary sparse/0 writer used only as a test fixture."""
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    from PIL import Image as PILImage

    rng = np.random.RandomState(1)

    with open(os.path.join(root, "sparse/0/cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        # PINHOLE id=1: fx fy cx cy
        f.write(struct.pack("<iiQQ", 1, 1, 32, 24))
        f.write(struct.pack("<4d", 40.0, 40.0, 16.0, 12.0))

    def rotmat_to_qvec(R):
        w = math.sqrt(max(1 + R[0, 0] + R[1, 1] + R[2, 2], 0)) / 2
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
        return np.array([w, x, y, z])

    with open(os.path.join(root, "sparse/0/images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            theta = 2 * math.pi * i / n_cams
            pos = np.array([3 * math.cos(theta), 3 * math.sin(theta), 1.5])
            forward = -pos / np.linalg.norm(pos)  # to origin (+z cam axis)
            right = np.cross(forward, [0, 0, 1.0])
            right /= np.linalg.norm(right)
            down = np.cross(forward, right)
            R_w2c = np.stack([right, down, forward], axis=0)
            t = -R_w2c @ pos
            q = rotmat_to_qvec(R_w2c)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            name = f"img_{i:03d}.png".encode() + b"\x00"
            f.write(name)
            f.write(struct.pack("<Q", 0))
            PILImage.fromarray(
                rng.randint(0, 255, (24, 32, 3), np.uint8)
            ).save(os.path.join(root, "images", f"img_{i:03d}.png"))

    pts = rng.randn(200, 3) * 0.3
    pts[:100, 2] = -0.5 + rng.randn(100) * 0.005  # a ground plane
    with open(os.path.join(root, "sparse/0/points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<QdddBBBd", i, *p, 128, 128, 128, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return pts


def test_colmap_parser_roundtrip(tmp_path):
    from instant_nsr_pl_tpu.datasets.colmap_utils import (
        read_cameras_binary,
        read_images_binary,
        read_points3d_binary,
    )

    root = str(tmp_path / "scene")
    pts = _write_colmap_model(root)
    cams = read_cameras_binary(os.path.join(root, "sparse/0/cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 32 and cams[1].height == 24
    ims = read_images_binary(os.path.join(root, "sparse/0/images.bin"))
    assert len(ims) == 6
    assert ims[1].name == "img_000.png"
    p3d = read_points3d_binary(os.path.join(root, "sparse/0/points3D.bin"))
    assert len(p3d) == 200
    np.testing.assert_allclose(p3d[0].xyz, pts[0], atol=1e-12)


@pytest.mark.parametrize(
    "center_m,up_m",
    [
        # up='camera' = mean(cam - center): needs center below the ring
        # (center='camera' on a symmetric ring makes it degenerate — true in
        # the reference as well)
        ("lookat", "camera"),
        ("camera", "ground"),
        ("lookat", "ground"),
        ("point", "ground"),
    ],
)
def test_colmap_dataset_normalization(tmp_path, center_m, up_m):
    import instant_nsr_pl_tpu.datasets.colmap as colmap_mod

    colmap_mod.ColmapDatasetBase._cache = {}
    root = str(tmp_path / "scene")
    _write_colmap_model(root)
    cfg = config_from_dict(
        {
            "name": "colmap",
            "root_dir": root,
            "img_downscale": 1,
            "up_est_method": up_m,
            "center_est_method": center_m,
            "n_test_traj_steps": 5,
            "apply_mask": False,
        }
    )
    dm = datasets.make("colmap", cfg)
    dm.setup("fit")
    tr = dm.train
    assert tr.all_images.shape == (6, 24, 32, 3)
    centers = tr.all_c2w[:, :, 3]
    # scale: nearest camera at distance 1
    np.testing.assert_allclose(
        np.linalg.norm(centers, axis=-1).min(), 1.0, atol=1e-4
    )
    # cameras still look roughly at the (normalized) scene center
    fwd = -tr.all_c2w[:, :, 2]
    look = -centers / np.linalg.norm(centers, axis=1, keepdims=True)
    assert (fwd * look).sum(-1).min() > 0.7
    dm.setup("test")
    assert dm.test.all_c2w.shape == (5, 3, 4)


# ---------------------------------------------------------------------------
# on-disk export round-trip (scripts/make_synthetic_data.py)
# ---------------------------------------------------------------------------


def _exported_splits(tmp_path, fmt):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_synthetic_data import _splits, export_blender, export_dtu

    splits = _splits(size=24, n_train=3, n_val=2, n_test=2, fov=0.8)
    root = str(tmp_path / fmt)
    if fmt == "blender":
        export_blender(root, splits, fov=0.8)
    else:
        export_dtu(root, splits)
    return root, splits


def test_blender_export_roundtrip(tmp_path):
    root, splits = _exported_splits(tmp_path, "blender")
    cfg = config_from_dict(
        {"name": "blender", "root_dir": root, "img_wh": [24, 24]}
    )
    dm = datasets.make("blender", cfg)
    dm.setup("fit")
    src = splits["train"]
    tr = dm.train
    np.testing.assert_allclose(tr.all_c2w, src.all_c2w, atol=1e-6)
    np.testing.assert_allclose(tr.directions, src.directions, atol=1e-4)
    # images round-trip through 8-bit png (masked like the system does:
    # outside the fg mask the source rgb is white bg, loader rgb arbitrary)
    m = src.all_fg_masks[..., None]
    np.testing.assert_allclose(
        tr.all_images * m, src.all_images * m, atol=2 / 255
    )
    np.testing.assert_allclose(tr.all_fg_masks, src.all_fg_masks, atol=1e-3)


def test_dtu_export_roundtrip(tmp_path):
    root, splits = _exported_splits(tmp_path, "dtu")
    cfg = config_from_dict(
        {"name": "dtu", "root_dir": root, "img_wh": [24, 24]}
    )
    dm = datasets.make("dtu", cfg)
    dm.setup("fit")
    src = splits["train"]
    tr = dm.train
    # P = K @ w2c decomposition must reconstruct the OpenGL c2w exactly
    np.testing.assert_allclose(tr.all_c2w, src.all_c2w, atol=1e-5)
    # per-view direction grids all equal the shared synthetic grid
    for i in range(tr.directions.shape[0]):
        np.testing.assert_allclose(
            tr.directions[i], src.directions, atol=1e-4
        )
    m = src.all_fg_masks[..., None]
    np.testing.assert_allclose(
        tr.all_images * m, src.all_images * m, atol=2 / 255
    )
    np.testing.assert_allclose(tr.all_fg_masks, src.all_fg_masks, atol=1e-2)


def test_colmap_degenerate_up_falls_back(tmp_path):
    """center=camera + up=camera on a perfectly symmetric ring: the
    reference formula (colmap.py:62) normalizes ~0 into garbage; here it
    must warn and fall back to +z, producing finite poses."""
    import instant_nsr_pl_tpu.datasets.colmap as colmap_mod

    colmap_mod.ColmapDatasetBase._cache = {}
    root = str(tmp_path / "scene")
    _write_colmap_model(root)
    cfg = config_from_dict(
        {
            "name": "colmap",
            "root_dir": root,
            "img_downscale": 1,
            "up_est_method": "camera",
            "center_est_method": "camera",
            "n_test_traj_steps": 2,
        }
    )
    dm = datasets.make("colmap", cfg)
    with pytest.warns(UserWarning, match="degenerated"):
        dm.setup("fit")
    assert np.isfinite(dm.train.all_c2w).all()
    # min camera distance normalized to 1
    d = np.linalg.norm(dm.train.all_c2w[:, :, 3], axis=1)
    np.testing.assert_allclose(d.min(), 1.0, atol=1e-5)


def test_colmap_export_roundtrip(tmp_path):
    """scripts/make_synthetic_data.py colmap layout -> real loader: poses
    survive the OpenGL->COLMAP->normalize chain up to the normalization
    similarity transform (distance ratios + look-at preserved)."""
    import sys

    import instant_nsr_pl_tpu.datasets.colmap as colmap_mod

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_synthetic_data import _splits, export_colmap

    colmap_mod.ColmapDatasetBase._cache = {}
    splits = _splits(size=24, n_train=4, n_val=1, n_test=1, fov=0.8)
    root = str(tmp_path / "colmap")
    export_colmap(root, splits, fov=0.8)
    cfg = config_from_dict(
        {
            "name": "colmap",
            "root_dir": root,
            "img_downscale": 1,
            "up_est_method": "camera",
            "center_est_method": "camera",
            "n_test_traj_steps": 2,
        }
    )
    dm = datasets.make("colmap", cfg)
    dm.setup("fit")
    tr = dm.train
    src = splits["train"]
    assert tr.all_images.shape == src.all_images.shape
    # normalization is a similarity transform: pairwise camera distances
    # match up to one global scale, and relative camera orientations
    # (forward-axis Gram matrix) match exactly
    def pdist(c2w):
        p = c2w[:, :, 3]
        return np.linalg.norm(p[:, None] - p[None, :], axis=-1)

    d_src, d_tr = pdist(src.all_c2w), pdist(tr.all_c2w)
    s = d_tr.sum() / d_src.sum()
    np.testing.assert_allclose(d_tr, d_src * s, atol=1e-4)
    f_src = -src.all_c2w[:, :, 2]
    f_tr = -tr.all_c2w[:, :, 2]
    np.testing.assert_allclose(f_tr @ f_tr.T, f_src @ f_src.T, atol=1e-4)
    # images byte-identical through png
    np.testing.assert_allclose(tr.all_images, src.all_images, atol=2 / 255)
