#!/usr/bin/env python
"""COLMAP preprocessing runner (reference scripts/preprocess/):
feature extraction → matching → mapper → undistort, producing the
sparse/ layout the dataset loader expects.  Requires the `colmap` binary.

    python scripts/preprocess_colmap.py --source <dir with images/>
"""
import argparse
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True)
    p.add_argument("--camera_model", default="PINHOLE")
    p.add_argument("--no_gpu", action="store_true")
    args = p.parse_args(argv)
    if shutil.which("colmap") is None:
        sys.exit("colmap binary not found on PATH")
    src = args.source
    db = os.path.join(src, "distorted", "database.db")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    use_gpu = "0" if args.no_gpu else "1"
    run(["colmap", "feature_extractor", "--database_path", db,
         "--image_path", os.path.join(src, "input"),
         "--ImageReader.camera_model", args.camera_model,
         "--ImageReader.single_camera", "1",
         "--SiftExtraction.use_gpu", use_gpu])
    run(["colmap", "exhaustive_matcher", "--database_path", db,
         "--SiftMatching.use_gpu", use_gpu])
    sparse = os.path.join(src, "distorted", "sparse")
    os.makedirs(sparse, exist_ok=True)
    run(["colmap", "mapper", "--database_path", db,
         "--image_path", os.path.join(src, "input"),
         "--output_path", sparse])
    run(["colmap", "image_undistorter",
         "--image_path", os.path.join(src, "input"),
         "--input_path", os.path.join(sparse, "0"),
         "--output_path", src, "--output_type", "COLMAP"])
    # loader expects sparse/0
    out_sparse = os.path.join(src, "sparse")
    files = [f for f in os.listdir(out_sparse)
             if os.path.isfile(os.path.join(out_sparse, f))]
    os.makedirs(os.path.join(out_sparse, "0"), exist_ok=True)
    for f in files:
        shutil.move(os.path.join(out_sparse, f),
                    os.path.join(out_sparse, "0", f))
    print("done:", src)


if __name__ == "__main__":
    main()
