"""Image metrics: PSNR / SSIM / LPIPS.

Mirrors reference metrics.py: evaluates saved renders (renders/ and
renders_aggregate/) against gt/ and writes results_*.json +
per_view_*.json.

LPIPS: the reference downloads torchvision VGG/Alex backbones
(lpipsPyTorch/); this environment has no network egress and no
torchvision, so LPIPS runs only when a weights file is supplied via
$IBGS_LPIPS_WEIGHTS (a .npz with VGG16 conv weights + LPIPS lin layers,
layout documented in ibgs_tpu/eval/lpips.py); otherwise it is reported as
null.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.train import losses


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(-10.0 * np.log10(mse + 1e-12))


_ssim_jit = jax.jit(losses.ssim)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    return float(_ssim_jit(jnp.asarray(a), jnp.asarray(b)))


def lpips_fn():
    path = os.environ.get("IBGS_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    from ibgs_tpu.eval.lpips import LPIPS
    return LPIPS.from_npz(path)


def evaluate_dirs(render_dir: str, gt_dir: str):
    """Per-image + mean metrics over paired PNG directories."""
    import cv2
    names = sorted(os.listdir(render_dir))
    lp = lpips_fn()
    per_view = {"psnr": {}, "ssim": {}, "lpips": {}}
    for nm in names:
        r = cv2.imread(os.path.join(render_dir, nm))[..., ::-1] / 255.0
        g = cv2.imread(os.path.join(gt_dir, nm))[..., ::-1] / 255.0
        r = r.astype(np.float32)
        g = g.astype(np.float32)
        per_view["psnr"][nm] = psnr(r, g)
        per_view["ssim"][nm] = ssim(r, g)
        if lp is not None:
            per_view["lpips"][nm] = float(lp(r, g))
    mean = {
        k: (float(np.mean(list(v.values()))) if v else None)
        for k, v in per_view.items()
    }
    return mean, per_view


def evaluate_model_dir(model_path: str, splits=("renders", "renders_aggregate")):
    """Reference metrics.py:36-105 layout: test/ours_N/{renders,gt,...}."""
    results = {}
    test_root = os.path.join(model_path, "test")
    if not os.path.exists(test_root):
        return results
    for ours in sorted(os.listdir(test_root)):
        base = os.path.join(test_root, ours)
        gt_dir = os.path.join(base, "gt")
        for split in splits:
            rdir = os.path.join(base, split)
            if not (os.path.isdir(rdir) and os.path.isdir(gt_dir)
                    and os.listdir(rdir)):
                continue
            mean, per_view = evaluate_dirs(rdir, gt_dir)
            results[f"{ours}/{split}"] = mean
            with open(os.path.join(model_path,
                                   f"results_{split}.json"), "w") as f:
                json.dump({ours: {"PSNR": mean["psnr"],
                                  "SSIM": mean["ssim"],
                                  "LPIPS": mean["lpips"]}}, f, indent=2)
            with open(os.path.join(model_path,
                                   f"per_view_{split}.json"), "w") as f:
                json.dump(per_view, f, indent=2)
    return results
