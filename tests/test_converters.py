"""Round-trip tests for the dataset converters (scripts/preprocess/),
reference scripts/preprocess/{convert_dtu,convert_tnt,convert_data_to_json}.
The colmap CLI is absent in this image, so the known-pose init-file writers
are exercised (--init_only semantics) and parsed back with the package's
own COLMAP text readers."""
import json
import os
import shutil
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts", "preprocess"))

from ibgs_tpu.data import colmap

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "mini_colmap")


def _rand_pose(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
    t = rng.normal(0, 1, 3)
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    return w2c


def test_convert_dtu_init_roundtrip(tmp_path):
    """world_mat/scale_mat → init files → parse back: poses match."""
    from PIL import Image
    import convert_dtu

    rng = np.random.default_rng(3)
    scan = tmp_path / "scan24"
    (scan / "image").mkdir(parents=True)
    K = np.array([[520.0, 0, 320.0], [0, 510.0, 240.0], [0, 0, 1.0]])
    n = 5
    cams = {}
    w2cs = []
    for i in range(n):
        w2c = _rand_pose(rng)
        w2cs.append(w2c)
        P44 = np.eye(4)
        P44[:3, :4] = K @ w2c[:3, :4]
        # split arbitrarily into world_mat @ scale_mat (IDR convention)
        s = np.diag([2.0, 2.0, 2.0, 1.0])
        s[:3, 3] = [0.1, -0.2, 0.3]
        cams[f"world_mat_{i}"] = P44 @ np.linalg.inv(s)
        cams[f"scale_mat_{i}"] = s
        Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(
            scan / "image" / f"{i:06d}.png")
    np.savez(scan / "cameras_sphere.npz", **cams)

    convert_dtu.convert_scan(str(scan), init_only=True)

    cams_r = colmap.read_cameras_txt(str(scan / "sparse" / "cameras.txt"))
    imgs_r = colmap.read_images_txt(str(scan / "sparse" / "images.txt"))
    assert cams_r[1].model == "PINHOLE"
    np.testing.assert_allclose(cams_r[1].params[:2], [520.0, 510.0],
                               rtol=1e-5)
    assert len(imgs_r) == n
    for iid in imgs_r:
        im = imgs_r[iid]
        k = int(im.name.split(".")[0])
        R = colmap.qvec_to_rotmat(im.qvec)
        np.testing.assert_allclose(R, w2cs[k][:3, :3], atol=1e-5)
        np.testing.assert_allclose(im.tvec, w2cs[k][:3, 3], atol=1e-5)


def test_convert_tnt_init_roundtrip(tmp_path):
    import convert_tnt

    rng = np.random.default_rng(4)
    scene = tmp_path / "truck"
    (scene / "images_raw").mkdir(parents=True)
    n = 4
    w2cs = [_rand_pose(rng) for _ in range(n)]
    names = [f"{i:06d}.jpg" for i in range(n)]
    for nm in names:
        (scene / "images_raw" / nm).write_bytes(b"")
    with open(scene / "truck_COLMAP_SfM.log", "w") as f:
        for i, w2c in enumerate(w2cs):
            c2w = np.linalg.inv(w2c)
            f.write(f"{i} {i} 0\n")
            for r in range(4):
                f.write(" ".join(f"{v:.17g}" for v in c2w[r]) + "\n")

    convert_tnt.convert_scene(str(scene), init_only=True)

    cams_r = colmap.read_cameras_txt(str(scene / "sparse" / "cameras.txt"))
    imgs_r = colmap.read_images_txt(str(scene / "sparse" / "images.txt"))
    assert cams_r[1].model == "RADIAL" and cams_r[1].params[0] == 0.6 * 1920
    assert len(imgs_r) == n
    for iid in imgs_r:
        im = imgs_r[iid]
        k = int(im.name.split(".")[0])
        np.testing.assert_allclose(colmap.qvec_to_rotmat(im.qvec),
                                   w2cs[k][:3, :3], atol=1e-6)
        np.testing.assert_allclose(im.tvec, w2cs[k][:3, 3], atol=1e-6)


def test_transforms_json_and_split(tmp_path):
    import convert_data_to_json as cj

    scene = tmp_path / "scene"
    shutil.copytree(FIXTURE, scene)
    out = cj.export_transforms(str(scene), "object")
    assert len(out["frames"]) == 4
    assert out["w"] == 64 and out["h"] == 48
    # GL-flipped c2w rows invert back to the COLMAP pose
    sparse = str(scene / "sparse" / "0")
    _, imgs, _, _ = colmap.load_sparse(sparse)
    by_name = {imgs[i].name: imgs[i] for i in imgs}
    gl = np.array([1, -1, -1, 1])[:, None]
    for fr in out["frames"]:
        im = by_name[os.path.basename(fr["file_path"])]
        c2w = np.asarray(fr["transform_matrix"]) * gl
        w2c = np.linalg.inv(c2w)
        np.testing.assert_allclose(w2c[:3, :3],
                                   colmap.qvec_to_rotmat(im.qvec), atol=1e-6)
        np.testing.assert_allclose(w2c[:3, 3], im.tvec, atol=1e-6)
    # object bounds: cameras ring at radius 2 looking at the origin
    assert np.linalg.norm(out["sphere_center"]) < 0.5
    assert 1.5 < out["sphere_radius"] < 3.0

    split = cj.write_split(str(scene), hold=4)
    assert len(split["test"]) == 1 and len(split["train"]) == 3
    # the loader consumes it (dataset.py split.json path)
    from ibgs_tpu.data.dataset import load_scene
    sc = load_scene(str(scene), eval_split=True, multi_view_num=3,
                    multi_view_max_angle=120.0, multi_view_max_dis=10.0)
    assert len(sc.test_cameras) == 1 and len(sc.train_cameras) == 3
    assert sc.test_infos[0].image_name == split["test"][0]
