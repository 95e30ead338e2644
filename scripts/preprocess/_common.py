"""Shared helpers for the dataset converters (reference
scripts/preprocess/{convert_dtu,convert_tnt,convert_data_to_json}.py).

Fresh implementations of the same behaviours: projection-matrix
decomposition, COLMAP known-pose initialisation files, and the colmap CLI
steps (triangulate → bundle-adjust → undistort) gated on the binary being
present.
"""
from __future__ import annotations

import os
import shutil
import sqlite3
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → wxyz quaternion (COLMAP convention)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def decompose_projection(P: np.ndarray):
    """P (3,4) → (K (3,3) with K[2,2]=1, c2w pose (4,4)) — the IDR
    load_K_Rt_from_P semantics (reference convert_dtu.py:33-56) via RQ
    decomposition instead of cv2.decomposeProjectionMatrix."""
    from scipy.linalg import rq
    K, R = rq(P[:, :3])
    s = np.diag(np.sign(np.diag(K)))
    K, R = K @ s, s @ R
    if np.linalg.det(R) < 0:
        R, P = -R, np.concatenate([-P[:, :3], P[:, 3:]], axis=1)
    t = np.linalg.inv(K) @ P[:, 3]
    K = K / K[2, 2]
    pose = np.eye(4)
    pose[:3, :3] = R.T           # cam→world rotation
    pose[:3, 3] = -R.T @ t       # camera centre
    return K, pose


def db_image_ids(db_file: str):
    """image name → id from a COLMAP database.db (sqlite3)."""
    db = sqlite3.connect(db_file)
    try:
        return {name: iid for iid, name in
                db.execute("SELECT image_id, name FROM images")}
    finally:
        db.close()


def write_colmap_init(out_dir: str, records: dict, camera_line: str,
                      db_file: str | None = None):
    """Write known-pose COLMAP text init files (cameras/images/points3D.txt;
    reference create_init_files): `records` maps image name → (qvec wxyz,
    tvec); `camera_line` is the single shared-camera row.  Image ids come
    from the feature database when present (COLMAP requires matching ids),
    else sequential over sorted names."""
    os.makedirs(out_dir, exist_ok=True)
    if db_file and os.path.exists(db_file):
        ids = db_image_ids(db_file)
    else:
        ids = {n: k + 1 for k, n in enumerate(sorted(records))}
    with open(os.path.join(out_dir, "cameras.txt"), "w") as f:
        f.write(camera_line + "\n")
    with open(os.path.join(out_dir, "images.txt"), "w") as f:
        for name in sorted(records, key=lambda n: ids[n]):
            q, t = records[name]
            f.write(f"{ids[name]} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} 1 {name}\n\n")
    open(os.path.join(out_dir, "points3D.txt"), "w").close()


def run_colmap(args: list, check=True):
    print("+ colmap", " ".join(args), flush=True)
    return subprocess.run(["colmap"] + args, check=check)


def have_colmap() -> bool:
    return shutil.which("colmap") is not None


def colmap_triangulate_ba_undistort(scene_path: str, image_dir: str,
                                    db_file: str, sparse_dir: str):
    """point_triangulator → bundle_adjuster → image_undistorter (the tail
    of reference convert_dtu.py:188-216 / convert_tnt.py), producing the
    undistorted sparse/ + images/ layout the loader consumes."""
    run_colmap(["point_triangulator",
                "--database_path", db_file,
                "--image_path", image_dir,
                "--input_path", sparse_dir,
                "--output_path", sparse_dir,
                "--Mapper.tri_ignore_two_view_tracks=true"])
    run_colmap(["bundle_adjuster",
                "--input_path", sparse_dir,
                "--output_path", sparse_dir,
                "--BundleAdjustment.refine_extrinsics=true"])
    run_colmap(["image_undistorter",
                "--image_path", image_dir,
                "--input_path", sparse_dir,
                "--output_path", scene_path,
                "--output_type", "COLMAP"])
