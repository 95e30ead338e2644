"""Evaluation rendering driver (reference render.py).

Renders train/test splits of a trained model: base renders, aggregated
(colour-fusion) renders, depth + normal maps; measures FPS of the full IBGS
test-time pipeline (source-depth re-render + blend + aggregation net) and
the on-disk memory footprint; optionally integrates a TSDF volume from the
train views and extracts a mesh.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from ibgs_tpu.data.dataset import SceneData
from ibgs_tpu.models import aggregation
from ibgs_tpu.ops.rasterize import RasterConfig
from ibgs_tpu.renderer import (render_depth_view, render_view,
                               source_views_from_stacks)
from ibgs_tpu.train.trainer import TrainState


def _save_png(path, img):
    import cv2
    arr = np.clip(np.asarray(img), 0, 1)
    cv2.imwrite(path, (arr[..., ::-1] * 255).astype(np.uint8))


def _colorize_depth(d):
    d = np.asarray(d)
    lo, hi = np.percentile(d[d > 0], 2) if (d > 0).any() else 0, d.max() + 1e-9
    x = np.clip((d - lo) / (hi - lo + 1e-9), 0, 1)
    import cv2
    cm = cv2.applyColorMap((255 - x * 255).astype(np.uint8),
                           cv2.COLORMAP_MAGMA)
    return cm[..., ::-1] / 255.0


def folder_size_mb(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e6


class EvalRenderer:
    """Jit-cached full test-time pipeline."""

    def __init__(self, state: TrainState, scene: SceneData,
                 opt: OptimizationParams, rcfg: RasterConfig, net=None):
        self.state = state
        self.scene = scene
        self.opt = opt
        self.rcfg = rcfg
        self.net = net
        w2v, centers, _ = scene.poses_stack()
        H, W = scene.images.shape[1:3]
        self.H, self.W = H, W
        self.stacks = dict(images=jnp.asarray(scene.images),
                           w2v=jnp.asarray(w2v),
                           centers=jnp.asarray(centers))
        self._depth_fn = jax.jit(lambda m, c: render_depth_view(
            m, c, rcfg, learnt_normal=opt.learnt_normal))
        self._render_fn = jax.jit(self._render_impl)

    def _render_impl(self, model, cam, src, net_params):
        res, dnormal = render_view(
            model, cam, self.rcfg, jnp.zeros(3), src=src,
            learnt_normal=self.opt.learnt_normal, render_geo=True,
            return_depth_normal=True)
        out = dict(render=res.render, depth=res.median_depth,
                   normal=res.normal, dnormal=dnormal,
                   ray=res.ibr.camera_ray if res.ibr is not None else None)
        if self.net is not None and net_params is not None:
            fusion = aggregation.fuse_color(
                self.net, net_params, res.render, res.ibr.warped_image,
                res.ibr.cam_feat, res.ibr.camera_ray, res.ibr.min_depth_diff,
                res.ibr.use_first_src_mask, jnp.float32(1.0),
                self.opt.nb_visible_src_frames,
                self.opt.enable_exposure_correction,
                self.opt.residual_resolution_scale,
                self.opt.enable_mix_precision)
            out["aggregate"] = jnp.where(fusion["any_valid"],
                                         fusion["image_pred"], res.render)
            out["residual"] = fusion["residual"]
        return out

    def render_one(self, cam, nearest):
        """Full test-time path: re-render source depths, then render+fuse."""
        model = self.state.model
        nbrs = nearest[: self.opt.number_src_frames]
        depths = [self._depth_fn(model, self.scene.train_cameras[i])
                  for i in nbrs]
        S = self.rcfg.max_src
        idx = np.zeros((S,), np.int32)
        idx[: len(nbrs)] = nbrs
        # compact S-sized stacks (NOT a zeroed (N_train, H, W) scatter —
        # that's O(N_train*H*W) HBM traffic per rendered view)
        dstack = jnp.stack(
            list(depths) + [jnp.zeros((self.H, self.W))] * (S - len(depths)))
        src = source_views_from_stacks(
            self.stacks["images"][jnp.asarray(idx)], dstack,
            self.stacks["w2v"][jnp.asarray(idx)],
            self.stacks["centers"][jnp.asarray(idx)],
            jnp.arange(S, dtype=jnp.int32), jnp.int32(len(nbrs)), cam)
        return self._render_impl_cached(model, cam, src)

    def _render_impl_cached(self, model, cam, src):
        return self._render_fn(model, cam, src, self.state.net_params)


def render_split(ev: EvalRenderer, cameras, gts, nearest_ids, out_dir,
                 measure_fps=False, fps_loops=5):
    os.makedirs(out_dir, exist_ok=True)
    for sub in ("renders", "renders_aggregate", "gt", "depth", "normal"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    fps = None
    if measure_fps and cameras:
        for loop in range(fps_loops + 1):     # first loop warms the jit
            t0 = time.time()
            for k, cam in enumerate(cameras):
                out = ev.render_one(cam, nearest_ids[k])
            jax.block_until_ready(out["render"])
            if loop == 0:
                times = []
            else:
                times.append(time.time() - t0)
        fps = len(cameras) / float(np.mean(times))

    for k, cam in enumerate(cameras):
        out = ev.render_one(cam, nearest_ids[k])
        name = f"{k:05d}.png"
        _save_png(os.path.join(out_dir, "renders", name), out["render"])
        if "aggregate" in out:
            _save_png(os.path.join(out_dir, "renders_aggregate", name),
                      out["aggregate"])
        _save_png(os.path.join(out_dir, "gt", name), gts[k])
        _save_png(os.path.join(out_dir, "depth", name),
                  _colorize_depth(out["depth"]))
        _save_png(os.path.join(out_dir, "normal", name),
                  (np.asarray(out["normal"]) + 1) / 2)
    return fps


def filter_depth_by_view_angle(depth, dnormal, ray, max_angle_deg=80.0):
    """Zero depths whose depth-derived normal is near-perpendicular to the
    viewing ray (reference render.py:251-259, use_depth_filter): grazing
    surfaces produce unreliable depths that corrupt the TSDF."""
    d = np.asarray(depth)
    n = np.asarray(dnormal)
    n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    r = np.asarray(ray)
    r = r / (np.linalg.norm(r, axis=-1, keepdims=True) + 1e-12)
    dot = np.abs((n * r).sum(-1))
    angle = np.arccos(np.clip(dot, -1.0, 1.0))
    return np.where(angle > np.deg2rad(max_angle_deg), 0.0, d)


def dump_test_time_data(ev: EvalRenderer, model_path, iteration,
                        ext="jpg"):
    """Store the test-time source data exactly as the reference does
    (render.py:157-186): train images re-encoded to `ext` and RELOADED into
    the source stacks (so eval sees compression artefacts, mimicking the
    real deployment), plus per-train-view intrinsics (fx,fy,cx,cy) and
    extrinsics (axis-angle + translation) npy files.  Returns the dump dir
    (its on-disk size is part of the reference's memory metric)."""
    import cv2
    from scipy.spatial.transform import Rotation

    misc_path = os.path.join(model_path, "test_time_data",
                             f"ours_{iteration}")
    os.makedirs(os.path.join(misc_path, "images"), exist_ok=True)
    scene = ev.scene
    imgs, intr, extr = [], [], []
    for k, cam in enumerate(scene.train_cameras):
        p = os.path.join(misc_path, "images", f"{k:05d}.{ext}")
        _save_png(p, scene.images[k])
        back = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
        imgs.append(back)
        intr.append([float(cam.fx), float(cam.fy),
                     float(cam.cx), float(cam.cy)])
        w2c = np.asarray(cam.view)[:3]
        rotvec = Rotation.from_matrix(w2c[:3, :3]).as_rotvec()
        extr.append(np.concatenate([rotvec, w2c[:3, 3]]).astype(np.float32))
    np.save(os.path.join(misc_path, "test_intrinsic.npy"),
            np.stack(intr).astype(np.float32))
    np.save(os.path.join(misc_path, "test_extrinsic.npy"), np.stack(extr))
    # reload: the stored (lossy) images become the warping sources
    ev.stacks["images"] = jnp.asarray(np.stack(imgs))
    return misc_path


def extract_tsdf_mesh(ev: EvalRenderer, out_path, voxel_size=0.01,
                      depth_trunc=None, use_depth_filter=False):
    """Integrate every train view's median depth into a TSDF and extract a
    mesh (reference render.py:261-286)."""
    from ibgs_tpu.eval.tsdf import (TSDFVolume, post_process_mesh,
                                    save_mesh_ply)
    scene = ev.scene
    pts = scene.points
    lo = pts.min(0) - 0.2 * np.ptp(pts, 0)
    hi = pts.max(0) + 0.2 * np.ptp(pts, 0)
    vol = TSDFVolume(lo, hi, voxel_size=max(voxel_size,
                                            float(np.ptp(hi - lo)) / 512))
    for k, cam in enumerate(scene.train_cameras):
        out = ev.render_one(cam, scene.nearest_ids[k])
        depth = out["depth"]
        if use_depth_filter and out.get("dnormal") is not None:
            depth = filter_depth_by_view_angle(depth, out["dnormal"],
                                               out["ray"])
        K = np.array([[float(cam.fx), 0, float(cam.cx)],
                      [0, float(cam.fy), float(cam.cy)], [0, 0, 1]],
                     np.float32)
        vol.integrate(depth, ev.stacks["images"][k], K,
                      np.asarray(cam.view))
    verts, faces = vol.extract_mesh()
    verts, faces = post_process_mesh(verts, faces)
    save_mesh_ply(out_path, verts, faces)
    return verts, faces
