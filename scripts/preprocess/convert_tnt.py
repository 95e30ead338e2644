#!/usr/bin/env python
"""Tanks&Temples scene → COLMAP layout (reference
scripts/preprocess/convert_tnt.py).

Per scene directory (images_raw/ + <scene>_COLMAP_SfM.log):
  1. parse the TnT .log camera trajectory (5-line blocks: header + 4x4
     c2w pose) and invert to w2c;
  2. write known-pose COLMAP init files (RADIAL camera with f = 0.6·W,
     principal point at the centre, k1 = k2 = 0 — the reference template);
  3. if the `colmap` binary is available: feature extraction + sequential
     matching, then triangulation → bundle adjustment → undistortion.

    python scripts/preprocess/convert_tnt.py --tnt_path <root with scenes/>
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (colmap_triangulate_ba_undistort, have_colmap,
                     rotmat_to_qvec, run_colmap, write_colmap_init)


def load_sfm_log(cam_file: str, names):
    """TnT .log trajectory → {image name: w2c (4,4)}.  Blocks are a header
    `idx valid ...` then four rows of the c2w matrix; invalid entries
    (valid == -1) are skipped."""
    lines = [l.strip() for l in open(cam_file) if l.strip()]
    poses = {}
    for b in range(0, len(lines), 5):
        head = lines[b].split()
        if head[1] == "-1":
            continue
        idx = int(head[0])
        c2w = np.array([[float(x) for x in lines[b + 1 + r].split()]
                        for r in range(4)])
        poses[names[idx]] = np.linalg.inv(c2w)
    return poses


def convert_scene(scene_path: str, init_only: bool = False,
                  width: int = 1920, height: int = 1080):
    img_dir = os.path.join(scene_path, "images_raw")
    assert os.path.isdir(img_dir), f"images_raw/ missing under {scene_path}"
    names = sorted(os.listdir(img_dir))
    scene = os.path.basename(os.path.normpath(scene_path))
    log = os.path.join(scene_path, f"{scene}_COLMAP_SfM.log")
    poses = load_sfm_log(log, names)

    records = {n: (rotmat_to_qvec(w2c[:3, :3]), w2c[:3, 3])
               for n, w2c in poses.items()}
    f = 0.6 * width
    cam_line = (f"1 RADIAL {width} {height} {f} {width / 2.0} "
                f"{height / 2.0} 0 0")

    db_file = os.path.join(scene_path, "database.db")
    sparse = os.path.join(scene_path, "sparse")
    use_colmap = have_colmap() and not init_only
    if use_colmap:
        run_colmap(["feature_extractor", "--database_path", db_file,
                    "--image_path", img_dir,
                    "--ImageReader.camera_model=RADIAL",
                    "--ImageReader.single_camera=true"])
        run_colmap(["sequential_matcher", "--database_path", db_file])
    write_colmap_init(sparse, records, cam_line,
                      db_file if use_colmap else None)
    if use_colmap:
        colmap_triangulate_ba_undistort(scene_path, img_dir, db_file, sparse)
    else:
        print(f"[convert_tnt] colmap unavailable/skipped: wrote known-pose "
              f"init files to {sparse} only")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tnt_path", required=True)
    p.add_argument("--init_only", action="store_true")
    args = p.parse_args(argv)
    for scene in sorted(os.listdir(args.tnt_path)):
        scene_path = os.path.join(args.tnt_path, scene)
        if not os.path.isdir(scene_path):
            continue
        print(f"[convert_tnt] {scene}")
        convert_scene(scene_path, init_only=args.init_only)


if __name__ == "__main__":
    main()
