"""End-to-end COLMAP data-path test on the committed miniature fixture
(tests/fixtures/mini_colmap: 4 tiny images + binary sparse files, generated
by tests/fixtures/make_colmap_fixture.py).  Covers the previously untested
chain load_scene → Scene buffers → train (reference analog:
scene/__init__.py + colmap_loader.py driven by train.py)."""
import json
import os

import numpy as np
import pytest

from ibgs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from ibgs_tpu.data.dataset import load_scene, write_multiview_json

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "mini_colmap")


def test_load_scene_colmap_binary():
    scene = load_scene(FIXTURE, multi_view_num=3, multi_view_max_angle=120.0,
                       multi_view_max_dis=10.0)
    assert len(scene.train_cameras) == 4 and not scene.test_cameras
    assert scene.images.shape == (4, 48, 64, 3)
    assert scene.points.shape == (300, 3) and scene.colors.shape == (300, 3)
    assert 0.0 <= scene.images.min() and scene.images.max() <= 1.0
    assert scene.cameras_extent > 1.0
    # geometric consistency: the point cloud projects inside every view
    for cam in scene.train_cameras:
        pc = scene.points @ np.asarray(cam.view)[:3, :3].T \
            + np.asarray(cam.view)[:3, 3]
        assert (pc[:, 2] > 0).mean() > 0.95
        u = pc[:, 0] / pc[:, 2] * float(cam.fx) + float(cam.cx)
        assert ((u > 0) & (u < 64)).mean() > 0.8
    # every view has neighbours, none lists itself first
    for k, ids in enumerate(scene.nearest_ids):
        assert len(ids) >= 1 and all(i != k for i in ids)


def test_point_quality_filter():
    """The fixture carries 8 bad seed points (4 with reprojection error 5.0,
    4 with track length 1) after the 300 good ones; load_sparse must drop
    them per the reference filter (scene/colmap_loader.py:144-157)."""
    from ibgs_tpu.data import colmap
    sparse = os.path.join(FIXTURE, "sparse", "0")
    _, _, pts, rgb = colmap.load_sparse(sparse)
    assert pts.shape == (300, 3) and rgb.shape == (300, 3)
    _, _, raw, _ = colmap.load_sparse(sparse, filter_points=False)
    assert raw.shape == (308, 3)
    # the bad points sit far from the origin — none may survive
    assert np.linalg.norm(pts, axis=-1).max() < 10.0


def _write_cameras_bin(path, model_id, params):
    import struct
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, model_id, 64, 48))
        f.write(struct.pack(f"<{len(params)}d", *params))


def _sparse_copy_with_cameras(tmp_path, model_id, params):
    import shutil
    src = os.path.join(FIXTURE, "sparse", "0")
    dst = tmp_path / "scene" / "sparse" / "0"
    dst.mkdir(parents=True)
    for name in ("images.bin", "points3D.bin"):
        shutil.copy(os.path.join(src, name), dst / name)
    _write_cameras_bin(str(dst / "cameras.bin"), model_id, params)
    os.symlink(os.path.join(FIXTURE, "images"),
               tmp_path / "scene" / "images")
    return str(tmp_path / "scene")


def test_distorted_camera_rejected(tmp_path):
    """Reference refuses non-pinhole models (dataset_readers.py:199-206);
    a SIMPLE_RADIAL camera with real distortion must fail loudly, not be
    silently treated as pinhole."""
    root = _sparse_copy_with_cameras(
        tmp_path, 2, [60.0, 32.0, 24.0, 0.1])   # SIMPLE_RADIAL, k=0.1
    with pytest.raises(ValueError, match="SIMPLE_RADIAL"):
        load_scene(root)


def test_zero_distortion_simple_radial_accepted(tmp_path):
    """k == 0 SIMPLE_RADIAL is exactly a pinhole; keep loading it."""
    root = _sparse_copy_with_cameras(
        tmp_path, 2, [60.0, 32.0, 24.0, 0.0])
    scene = load_scene(root, multi_view_num=3, multi_view_max_angle=120.0,
                       multi_view_max_dis=10.0)
    assert len(scene.train_cameras) == 4


def test_load_scene_eval_split_holdout():
    scene = load_scene(FIXTURE, eval_split=True, multi_view_num=3,
                       multi_view_max_angle=120.0, multi_view_max_dis=10.0)
    # every-8th holdout: view 0 becomes test (reference scene/__init__.py)
    assert len(scene.test_cameras) == 1 and len(scene.train_cameras) == 3
    assert scene.test_nearest_ids and len(scene.test_nearest_ids[0]) >= 1


@pytest.mark.slow
def test_exp_script_chain_on_fixture(tmp_path):
    """The reference protocol end-to-end through the ACTUAL CLIs
    (exp_script.py → train.py → render.py → metrics.py) on the COLMAP
    fixture (VERDICT r2 #6).  Done = results_renders*.json +
    result_fps_mem.json produced by one chained run."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import exp_script

    data_root = os.path.dirname(FIXTURE)
    out_root = str(tmp_path)
    exp_script.main([
        "--data_root", data_root, "--out_root", out_root,
        "--scenes", "mini_colmap",
        "--extra",
        "--eval", "--iterations", "15", "--densify_from_iter", "6",
        "--densification_interval", "6", "--densify_until_iter", "12",
        "--single_view_weight_from_iter", "8",
        "--multi_view_weight_from_iter", "8",
        "--use_color_aggregation", "--start_color_aggregation_iter", "10",
        "--color_aggregate_burnin_steps", "3",
        "--number_src_frames", "2", "--nb_visible_src_frames", "2",
        "--position_lr_max_steps", "15", "--multi_view_num", "3",
        "--multi_view_max_angle", "120", "--multi_view_max_dis", "10",
        "--backend", "oracle", "--instance_cap", "16384",
        "--save_iterations", "15", "--test_iterations", "15",
        "--checkpoint_iterations", "15", "--quiet",
    ])
    out = os.path.join(out_root, "custom", "mini_colmap")
    fps = json.load(open(os.path.join(out, "result_fps_mem.json")))
    assert fps["fps"] > 0 and fps["n_gaussians"] > 0
    res = json.load(open(os.path.join(out, "results_renders.json")))
    (vals,) = res.values()
    assert np.isfinite(vals["PSNR"]) and vals["PSNR"] > 5.0
    assert os.path.exists(os.path.join(out, "results_renders_aggregate.json"))
    assert os.path.exists(os.path.join(out, "per_view_renders.json"))


@pytest.mark.slow
def test_train_on_colmap_fixture(tmp_path):
    scene = load_scene(FIXTURE, multi_view_num=3, multi_view_max_angle=120.0,
                       multi_view_max_dis=10.0)
    write_multiview_json(scene, str(tmp_path))
    from ibgs_tpu.train.loop import train
    opt = OptimizationParams(
        iterations=20, densify_from_iter=8, densification_interval=8,
        densify_until_iter=18, opacity_reset_interval=10_000,
        single_view_weight_from_iter=10, multi_view_weight_from_iter=10,
        use_color_aggregation=False, number_src_frames=2,
        position_lr_max_steps=20)
    pipe = PipelineParams(backend="oracle", instance_cap=1 << 14)
    state, stacks = train(
        scene, ModelParams(sh_degree=0), opt, pipe, model_path=str(tmp_path),
        save_iterations=(20,), test_iterations=(), log_every=5, quiet=True)
    log = [json.loads(l) for l in
           open(os.path.join(tmp_path, "train_log.jsonl"))]
    assert np.isfinite(log[-1]["image_loss"])
    assert log[-1]["psnr"] > log[0]["psnr"], (log[0], log[-1])
    assert os.path.exists(os.path.join(tmp_path, "multi_view.json"))
    assert os.path.exists(os.path.join(
        tmp_path, "point_cloud", "iteration_20", "point_cloud.ply"))
