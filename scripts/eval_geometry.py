#!/usr/bin/env python
"""Geometry evaluation: DTU chamfer distance and TnT-style F-score.

Replaces the reference's open3d-based toolboxes
(scripts/eval_dtu/eval.py — point-sampled chamfer with bounding-volume
culling; scripts/tnt_eval/evaluation.py — precision/recall/F-score at a
distance threshold) with a self-contained scipy implementation.

    python scripts/eval_geometry.py chamfer --mesh out/mesh.ply --gt gt.ply \
        [--max_dist 20] [--downsample 0.2]
    python scripts/eval_geometry.py fscore --mesh out/mesh.ply --gt gt.ply \
        --threshold 0.05
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
from scipy.spatial import cKDTree

from ibgs_tpu.eval.tsdf import load_mesh_ply


def sample_mesh(verts, faces, n=1_000_000, seed=0):
    """Uniform area-weighted surface sampling."""
    if len(faces) == 0:
        return verts
    rng = np.random.default_rng(seed)
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    probs = area / max(area.sum(), 1e-12)
    fi = rng.choice(len(faces), size=n, p=probs)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    return a[fi] + u * (b[fi] - a[fi]) + v * (c[fi] - a[fi])


def voxel_downsample(pts, voxel):
    if voxel <= 0:
        return pts
    key = np.floor(pts / voxel).astype(np.int64)
    _, idx = np.unique(key, axis=0, return_index=True)
    return pts[idx]


def load_points(path):
    """Mesh PLY → sampled points; point-cloud PLY → points."""
    verts, faces = load_mesh_ply(path)
    if len(faces):
        return sample_mesh(verts, faces)
    return verts


def chamfer(args):
    """DTU-style: mean data→GT and GT→data distances, max_dist culled
    (reference scripts/eval_dtu/eval.py semantics)."""
    data = load_points(args.mesh)
    gt = load_points(args.gt)
    data = voxel_downsample(data, args.downsample)
    gt = voxel_downsample(gt, args.downsample)
    d2g = cKDTree(gt).query(data, k=1)[0]
    g2d = cKDTree(data).query(gt, k=1)[0]
    d2g = d2g[d2g < args.max_dist]
    g2d = g2d[g2d < args.max_dist]
    acc = float(d2g.mean())
    comp = float(g2d.mean())
    out = {"accuracy": acc, "completeness": comp,
           "overall": (acc + comp) / 2}
    print(json.dumps(out, indent=2))
    return out


def fscore(args):
    """TnT-style precision/recall/F at threshold τ
    (reference scripts/tnt_eval/evaluation.py)."""
    data = load_points(args.mesh)
    gt = load_points(args.gt)
    data = voxel_downsample(data, args.threshold / 2)
    gt = voxel_downsample(gt, args.threshold / 2)
    d2g = cKDTree(gt).query(data, k=1)[0]
    g2d = cKDTree(data).query(gt, k=1)[0]
    precision = float((d2g < args.threshold).mean())
    recall = float((g2d < args.threshold).mean())
    f = 2 * precision * recall / max(precision + recall, 1e-12)
    out = {"precision": precision, "recall": recall, "fscore": f,
           "threshold": args.threshold}
    print(json.dumps(out, indent=2))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("chamfer")
    c.add_argument("--mesh", required=True)
    c.add_argument("--gt", required=True)
    c.add_argument("--max_dist", type=float, default=20.0)
    c.add_argument("--downsample", type=float, default=0.2)
    f = sub.add_parser("fscore")
    f.add_argument("--mesh", required=True)
    f.add_argument("--gt", required=True)
    f.add_argument("--threshold", type=float, default=0.05)
    args = p.parse_args(argv)
    return chamfer(args) if args.cmd == "chamfer" else fscore(args)


if __name__ == "__main__":
    main()
