"""Build a COLMAP sparse reconstruction (`sparse/0`) from an `images/` dir.

The role of the reference's scripts/imgs2poses.py (reference lines 12-70):
shells out to the ``colmap`` binary for feature extraction, exhaustive
matching and mapping, producing the layout the ``colmap`` dataset loader
reads. Requires a ``colmap`` executable on PATH.

Usage:
    python scripts/imgs2poses.py <scene_dir>        # expects <scene_dir>/images
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run_colmap(scene_dir: str, camera_model: str = "OPENCV", match_type: str = "exhaustive_matcher"):
    if shutil.which("colmap") is None:
        raise SystemExit(
            "colmap executable not found on PATH — install COLMAP "
            "(https://colmap.github.io) or run reconstruction elsewhere and "
            "copy sparse/0 into the scene dir"
        )
    images = os.path.join(scene_dir, "images")
    if not os.path.isdir(images):
        raise SystemExit(f"no images directory at {images}")
    db = os.path.join(scene_dir, "database.db")
    sparse = os.path.join(scene_dir, "sparse")
    os.makedirs(sparse, exist_ok=True)

    logfile = open(os.path.join(scene_dir, "colmap_output.txt"), "w")

    def call(args):
        print("running:", " ".join(args), flush=True)
        subprocess.run(args, check=True, stdout=logfile, stderr=subprocess.STDOUT)

    call([
        "colmap", "feature_extractor",
        "--database_path", db,
        "--image_path", images,
        "--ImageReader.single_camera", "1",
        "--ImageReader.camera_model", camera_model,
    ])
    call(["colmap", match_type, "--database_path", db])
    call([
        "colmap", "mapper",
        "--database_path", db,
        "--image_path", images,
        "--output_path", sparse,
    ])
    logfile.close()
    print(f"sparse model written under {sparse}/0")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scene_dir")
    p.add_argument("--camera_model", default="OPENCV")
    p.add_argument(
        "--match_type",
        default="exhaustive_matcher",
        choices=["exhaustive_matcher", "sequential_matcher"],
    )
    args = p.parse_args()
    if os.path.exists(os.path.join(args.scene_dir, "sparse", "0")):
        print("sparse/0 already exists; nothing to do")
        return
    run_colmap(args.scene_dir, args.camera_model, args.match_type)


if __name__ == "__main__":
    main()
