"""Artifact saver tests: panels, grids, OBJ round-trip, video, json/npz."""

import os

import numpy as np

from instant_nsr_pl_tpu.utils import savers


def test_panel_builders():
    rgb = np.random.rand(8, 12, 3)
    assert savers.rgb_to_panel(rgb).shape == (8, 12, 3)
    assert savers.grayscale_to_panel(np.random.rand(8, 12), "jet").shape == (8, 12, 3)
    assert savers.grayscale_to_panel(
        np.random.rand(8, 12, 1), None, data_range=(0, 1)
    ).shape == (8, 12, 3)
    assert savers.uv_to_panel(np.random.rand(8, 12, 2)).shape == (8, 12, 3)
    n = savers.normal_to_panel(np.random.rand(8, 12, 3) * 2 - 1)
    assert n.dtype == np.uint8


def test_image_grid_mixed_heights(tmp_path):
    specs = [
        {"type": "rgb", "img": np.random.rand(8, 6, 3)},
        {"type": "grayscale", "img": np.random.rand(4, 5), "kwargs": {"cmap": "magma"}},
    ]
    path = savers.save_image_grid(str(tmp_path), "grid.png", specs)
    assert os.path.exists(path)
    import cv2

    img = cv2.imread(path)
    assert img.shape == (8, 11, 3)


def test_obj_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    c = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    path = savers.save_obj(str(tmp_path), "mesh.obj", v, f, v_rgb=c)
    back = savers.load_obj(path)
    np.testing.assert_allclose(back["v_pos"], v, atol=1e-5)
    np.testing.assert_array_equal(back["t_pos_idx"], f)
    np.testing.assert_allclose(back["v_rgb"], c, atol=1e-3)


def test_obj_quad_triangulation(tmp_path):
    path = os.path.join(str(tmp_path), "quad.obj")
    with open(path, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    back = savers.load_obj(path)
    assert back["t_pos_idx"].shape == (2, 3)  # fan-triangulated


def test_video_from_frames(tmp_path):
    import cv2

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(5):
        cv2.imwrite(
            str(frames_dir / f"{i}.png"),
            np.random.randint(0, 255, (16, 16, 3), np.uint8),
        )
    path = savers.save_video(
        str(tmp_path), "out.mp4", str(frames_dir), r"(\d+)\.png", fps=5
    )
    assert os.path.getsize(path) > 100


def test_json_npz(tmp_path):
    p = savers.save_json(str(tmp_path), "metrics.json", {"psnr": 30.0})
    assert os.path.exists(p)
    p = savers.save_npz(str(tmp_path), "arrays.npz", a=np.ones(3))
    data = np.load(p)
    np.testing.assert_array_equal(data["a"], np.ones(3))


def test_gif_from_frames(tmp_path):
    import cv2
    from PIL import Image

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(4):
        cv2.imwrite(
            str(frames_dir / f"{i}.png"),
            np.full((16, 16, 3), i * 40, np.uint8),
        )
    path = savers.save_gif(
        str(tmp_path), "out", str(frames_dir), r"(\d+)\.png", fps=10
    )
    assert path.endswith(".gif")
    with Image.open(path) as im:
        assert im.n_frames == 4
        assert im.size == (16, 16)
    # empty frame dir -> None (reference behavior: nothing written)
    empty = tmp_path / "empty"
    empty.mkdir()
    assert savers.save_gif(
        str(tmp_path), "none.gif", str(empty), r"(\d+)\.png"
    ) is None


def test_img_sequence_dispatch(tmp_path):
    import cv2
    import pytest

    frames_dir = tmp_path / "seq"
    frames_dir.mkdir()
    for i in range(2):
        cv2.imwrite(
            str(frames_dir / f"{i}.png"), np.zeros((8, 8, 3), np.uint8)
        )
    mp4 = savers.save_img_sequence(
        str(tmp_path), "seq", str(frames_dir), r"(\d+)\.png"
    )
    assert mp4.endswith("seq.mp4")
    gif = savers.save_img_sequence(
        str(tmp_path), "seq", str(frames_dir), r"(\d+)\.png",
        save_format="gif",
    )
    assert gif.endswith("seq.gif")
    with pytest.raises(ValueError):
        savers.save_img_sequence(
            str(tmp_path), "seq", str(frames_dir), r"(\d+)\.png",
            save_format="webm",
        )


def test_cubemap_cross_layout(tmp_path):
    import cv2

    # 6 faces x 8x8, two 3-channel groups -> two crosses side by side
    img = np.zeros((6, 8, 8, 6), np.float32)
    img[4, ..., :3] = 1.0  # +z face (center of cross), first group
    path = savers.save_cubemap(str(tmp_path), "cube.png", img)
    out = cv2.imread(path)
    assert out.shape == (24, 64, 3)  # 3 rows x (4 cols x 2 groups) of 8px
    # +z sits at row 1, col 1 of the first cross and is white there
    assert out[8:16, 8:16].min() == 255
    # second group's +z cell is black (face 4 channels 3:6 are zero)
    assert out[8:16, 40:48].max() == 0
