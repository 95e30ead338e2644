#!/usr/bin/env python
"""DTU scene → COLMAP layout (reference scripts/preprocess/convert_dtu.py).

Per scan directory (containing image/*.png and cameras_sphere.npz):
  1. decompose P = world_mat @ scale_mat into intrinsics + pose per view
     (IDR convention);
  2. write known-pose COLMAP init files (cameras/images/points3D.txt,
     PINHOLE with principal point at the image centre — reference
     create_init_files);
  3. if the `colmap` binary is available: feature extraction + exhaustive
     matching, then triangulation → bundle adjustment → undistortion into
     the sparse/ + images/ layout the loader consumes.  Without colmap the
     init files are still written (--init_only skips the CLI outright).

    python scripts/preprocess/convert_dtu.py --dtu_path <root with scan*/>
"""
import argparse
import json
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (colmap_triangulate_ba_undistort, decompose_projection,
                     have_colmap, rotmat_to_qvec, run_colmap,
                     write_colmap_init)


def convert_scan(scene_path: str, init_only: bool = False):
    images = sorted(glob(os.path.join(scene_path, "image", "*.png")))
    assert images, f"no image/*.png under {scene_path}"
    from PIL import Image
    w, h = Image.open(images[0]).size

    cams = dict(np.load(os.path.join(scene_path, "cameras_sphere.npz")))
    records = {}
    intr = None
    for idx, path in enumerate(images):
        P = (cams[f"world_mat_{idx}"] @ cams[f"scale_mat_{idx}"])[:3, :4]
        K, c2w = decompose_projection(P)
        w2c = np.linalg.inv(c2w)
        records[os.path.basename(path)] = (rotmat_to_qvec(w2c[:3, :3]),
                                           w2c[:3, 3])
        intr = K
    # reference pins the principal point to the image centre
    cam_line = (f"1 PINHOLE {w} {h} {intr[0, 0]} {intr[1, 1]} "
                f"{w / 2.0} {h / 2.0}")

    db_file = os.path.join(scene_path, "database.db")
    sparse = os.path.join(scene_path, "sparse")
    use_colmap = have_colmap() and not init_only
    if use_colmap:
        run_colmap(["feature_extractor", "--database_path", db_file,
                    "--image_path", os.path.join(scene_path, "image"),
                    "--ImageReader.single_camera", "1",
                    "--ImageReader.camera_model=PINHOLE"])
        run_colmap(["exhaustive_matcher", "--database_path", db_file])
    write_colmap_init(sparse, records, cam_line,
                      db_file if use_colmap else None)
    with open(os.path.join(scene_path, "pinhole_dict.json"), "w") as f:
        json.dump({n: {"qvec": list(map(float, q)),
                       "tvec": list(map(float, t)),
                       "width": w, "height": h,
                       "fx": float(intr[0, 0]), "fy": float(intr[1, 1])}
                   for n, (q, t) in records.items()}, f, indent=2,
                  sort_keys=True)
    if use_colmap:
        colmap_triangulate_ba_undistort(
            scene_path, os.path.join(scene_path, "image"), db_file, sparse)
    else:
        print(f"[convert_dtu] colmap unavailable/skipped: wrote known-pose "
              f"init files to {sparse} only")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dtu_path", required=True,
                   help="root containing scan*/ directories")
    p.add_argument("--init_only", action="store_true",
                   help="write the known-pose init files without running "
                        "the colmap CLI")
    args = p.parse_args(argv)
    for scene in sorted(os.listdir(args.dtu_path)):
        scene_path = os.path.join(args.dtu_path, scene)
        if not os.path.isdir(scene_path) or "scan" not in scene:
            continue
        print(f"[convert_dtu] {scene}")
        convert_scan(scene_path, init_only=args.init_only)


if __name__ == "__main__":
    main()
