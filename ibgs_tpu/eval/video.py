"""Fly-through video rendering (reference utils/render_utils.py path)."""
from __future__ import annotations

import os

import numpy as np

from ibgs_tpu.core.camera import ellipse_path


def render_video(ev, out_path: str, n_frames: int = 120, fps: int = 30):
    """Render an elliptical camera path through the scene and write an mp4
    (falls back to a PNG sequence when no video codec is available)."""
    import cv2
    cams = ellipse_path(ev.scene.train_cameras, n_frames=n_frames)
    H, W = ev.H, ev.W
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (W, H))
    nearest = ev.scene.nearest_ids[0]
    frames_dir = None
    for k, cam in enumerate(cams):
        out = ev.render_one(cam, nearest)
        img = np.clip(np.asarray(out.get("aggregate", out["render"])), 0, 1)
        frame = (img[..., ::-1] * 255).astype(np.uint8)
        if writer.isOpened():
            writer.write(frame)
        else:
            frames_dir = out_path + "_frames"
            os.makedirs(frames_dir, exist_ok=True)
            cv2.imwrite(os.path.join(frames_dir, f"{k:05d}.png"), frame)
    writer.release()
    return out_path if frames_dir is None else frames_dir
