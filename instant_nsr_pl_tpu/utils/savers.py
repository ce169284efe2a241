"""Artifact savers: images, grids, video, meshes, json/npz.

Re-implements the reference's ``SaverMixin`` (utils/mixins.py:16-229) as free
functions keyed off an explicit ``save_dir`` — image writers with colormaps
(jet/magma/checkerboard-uv), side-by-side image grids, mp4/gif sequences via
frame-name regex, unfolded cubemap panels, OBJ meshes (own writer — trimesh
is not available in this environment), json and npz dumps.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _ensure_dir(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def _to_u8(img):
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    return img


def _apply_colormap(gray_u8, cmap):
    if cmap is None:
        return np.repeat(gray_u8[..., None], 3, axis=-1)
    cm = {"jet": cv2.COLORMAP_JET, "magma": cv2.COLORMAP_MAGMA}[cmap]
    return cv2.applyColorMap(gray_u8, cm)[..., ::-1]  # BGR -> RGB


def rgb_to_panel(img, data_range=(0, 1)):
    """(H, W, 3) float -> uint8 RGB panel."""
    lo, hi = data_range
    x = (np.asarray(img, np.float32) - lo) / max(hi - lo, 1e-8)
    return _to_u8(x)


def grayscale_to_panel(img, cmap="jet", data_range=None):
    """(H, W) or (H, W, 1) float -> uint8 RGB panel with colormap.

    ``data_range=None`` normalizes by the image's own min/max (the
    reference's behavior for depth panels)."""
    x = np.asarray(img, np.float32)
    if x.ndim == 3:
        x = x[..., 0]
    if data_range is None:
        lo, hi = float(x.min()), float(x.max())
    else:
        lo, hi = data_range
    x = (x - lo) / max(hi - lo, 1e-8)
    return _apply_colormap(_to_u8(x), cmap)


def uv_to_panel(img, checkerboard_size=64):
    """(H, W, 2) uv in [0,1] -> checkerboard visualization (reference
    utils/mixins.py uv path)."""
    uv = np.asarray(img, np.float32)
    h, w = uv.shape[:2]
    u = (uv[..., 0] * checkerboard_size).astype(np.int32)
    v = (uv[..., 1] * checkerboard_size).astype(np.int32)
    checker = ((u + v) % 2).astype(np.float32)
    return _to_u8(np.stack([checker] * 3, axis=-1))


def normal_to_panel(img):
    """(H, W, 3) world normals in [-1,1] -> rgb panel."""
    return _to_u8((np.asarray(img, np.float32) + 1.0) / 2.0)


_PANEL_FNS = {
    "rgb": rgb_to_panel,
    "grayscale": grayscale_to_panel,
    "uv": uv_to_panel,
    "normal": normal_to_panel,
}


def make_image_grid(specs):
    """Build one row of panels from specs: list of {type, img, kwargs}.

    Mirrors the reference's ``save_image_grid`` input format
    (utils/mixins.py:91-116; systems/nerf.py:140-145)."""
    panels = []
    for spec in specs:
        fn = _PANEL_FNS[spec["type"]]
        panels.append(fn(spec["img"], **spec.get("kwargs", {})))
    h = max(p.shape[0] for p in panels)
    padded = []
    for p in panels:
        if p.shape[0] < h:
            pad = np.zeros((h - p.shape[0], p.shape[1], 3), np.uint8)
            p = np.concatenate([p, pad], axis=0)
        padded.append(p)
    return np.concatenate(padded, axis=1)


def save_image(save_dir, filename, img_u8):
    path = _ensure_dir(os.path.join(save_dir, filename))
    cv2.imwrite(path, np.asarray(img_u8)[..., ::-1])  # RGB -> BGR
    return path


def save_image_grid(save_dir, filename, specs):
    return save_image(save_dir, filename, make_image_grid(specs))


def save_video(save_dir, filename, img_dir, matcher, fps=30):
    """Assemble frames matching ``matcher`` (regex with one int group) into
    an mp4, ordered by the captured integer (reference utils/mixins.py
    save_img_sequence). Uses cv2's VideoWriter (imageio's ffmpeg backend is
    not available in this environment)."""
    pat = re.compile(matcher)
    frames = []
    for name in os.listdir(img_dir):
        m = pat.search(name)
        if m:
            frames.append((int(m.group(1)), os.path.join(img_dir, name)))
    frames.sort()
    path = _ensure_dir(os.path.join(save_dir, filename))
    if not frames:
        return None
    first = cv2.imread(frames[0][1])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for _, f in frames:
        writer.write(cv2.imread(f))
    writer.release()
    return path


def save_gif(save_dir, filename, img_dir, matcher, fps=30):
    """Assemble frames matching ``matcher`` into an animated GIF (the
    reference's ``save_img_sequence(save_format='gif')``,
    utils/mixins.py:191-207). Uses PIL's GIF encoder (imageio's fps kwarg
    and ffmpeg plugins are unavailable in this environment)."""
    from PIL import Image

    pat = re.compile(matcher)
    frames = []
    for name in os.listdir(img_dir):
        m = pat.search(name)
        if m:
            frames.append((int(m.group(1)), os.path.join(img_dir, name)))
    frames.sort()
    if not frames:
        return None
    if not filename.endswith(".gif"):
        filename += ".gif"
    path = _ensure_dir(os.path.join(save_dir, filename))
    imgs = [Image.open(f).convert("RGB") for _, f in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=max(int(round(1000.0 / fps)), 1),
        loop=0,
    )
    return path


def save_img_sequence(save_dir, filename, img_dir, matcher, save_format="mp4",
                      fps=30):
    """Format-dispatching frame assembler (the reference's
    ``save_img_sequence`` surface, utils/mixins.py:191-207: ``save_format``
    in {'mp4', 'gif'})."""
    if save_format == "gif":
        return save_gif(save_dir, filename, img_dir, matcher, fps=fps)
    if save_format == "mp4":
        if not filename.endswith(".mp4"):
            filename += ".mp4"
        return save_video(save_dir, filename, img_dir, matcher, fps=fps)
    raise ValueError(f"unknown save_format {save_format!r} (mp4|gif)")


def save_cubemap(save_dir, filename, img, data_range=(0, 1)):
    """(6, S, S, C) face stack -> unfolded horizontal-cross panel(s), C
    consumed 3 channels at a time (reference utils/mixins.py:156-175
    ``save_cubemap``; face order +x, -x, +y, -y, +z, -z with -z centered):

            [ ]  +y  [ ]  [ ]
            -x   +z  +x   -z
            [ ]  -y  [ ]  [ ]
    """
    img = np.asarray(img, np.float32)
    assert img.ndim == 4 and img.shape[0] == 6 and img.shape[1] == img.shape[2]
    crosses = []
    for start in range(0, img.shape[-1], 3):
        faces = np.stack(
            [rgb_to_panel(img[i, ..., start : start + 3], data_range)
             for i in range(6)],
            axis=0,
        )
        size = faces.shape[1]
        blank = np.zeros((size, size, 3), np.uint8)
        cross = np.concatenate(
            [
                np.concatenate([blank, faces[2], blank, blank], axis=1),
                np.concatenate([faces[1], faces[4], faces[0], faces[5]], axis=1),
                np.concatenate([blank, faces[3], blank, blank], axis=1),
            ],
            axis=0,
        )
        crosses.append(cross)
    return save_image(save_dir, filename, np.concatenate(crosses, axis=1))


def save_obj(save_dir, filename, v_pos, t_pos_idx, v_rgb=None):
    """Minimal OBJ writer with optional per-vertex colors (the reference uses
    trimesh, utils/mixins.py:211-222; colors follow the common
    'v x y z r g b' extension)."""
    path = _ensure_dir(os.path.join(save_dir, filename))
    v = np.asarray(v_pos, np.float32)
    f = np.asarray(t_pos_idx, np.int64) + 1  # OBJ is 1-indexed
    lines = []
    if v_rgb is None:
        for p in v:
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    else:
        c = np.asarray(v_rgb, np.float32)
        for p, col in zip(v, c):
            lines.append(
                f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{col[0]:.4f} {col[1]:.4f} {col[2]:.4f}"
            )
    for tri in f:
        lines.append(f"f {tri[0]} {tri[1]} {tri[2]}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def load_obj(path):
    """Minimal OBJ reader (verts + triangulated faces), the utils/obj.py role
    (reference utils/obj.py:4-43)."""
    verts, faces, colors = [], [], []
    with open(path) as fh:
        for line in fh:
            parts = line.strip().split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
                if len(parts) >= 7:
                    colors.append([float(x) for x in parts[4:7]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for i in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[i], idx[i + 1]])
    out = {
        "v_pos": np.asarray(verts, np.float32),
        "t_pos_idx": np.asarray(faces, np.int64),
    }
    if colors:
        out["v_rgb"] = np.asarray(colors, np.float32)
    return out


def save_json(save_dir, filename, payload):
    path = _ensure_dir(os.path.join(save_dir, filename))
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path


def save_npz(save_dir, filename, **arrays):
    path = _ensure_dir(os.path.join(save_dir, filename))
    np.savez(path, **arrays)
    return path
