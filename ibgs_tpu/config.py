"""Configuration system.

Dataclass-backed param groups exposed reflectively as argparse flags, the
same UX as the reference (arguments/__init__.py): every field becomes
--<name>; saved to <model_path>/cfg_args.json and re-merged with CLI flags
at eval time (get_combined_args).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ModelParams:
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    sh_degree: int = 2
    multi_view_num: int = 8
    multi_view_max_angle: float = 30.0
    multi_view_min_dis: float = 0.01
    multi_view_max_dis: float = 1.5
    # Static model slot capacity at init (0 = auto: 4x seed points rounded
    # to a power of two).  Reference-scale runs (~1M seeds) set this
    # explicitly: capacity-sized sorts/scans pay for every padded row, and
    # the training loop doubles capacity on demand anyway.
    init_capacity: int = 0


@dataclass
class PipelineParams:
    backend: str = "pallas"            # "pallas" | "oracle"
    instance_cap: int = 1 << 20
    # staircase-interval binning (RasterConfig.staircase_cull): 13-16%
    # fewer tile instances at bench scales, output- and gradient-
    # preserving, measured faster on v5e at 960x544 AND 1080p — default
    # ON.  row_cap = 0 → instance_cap // 2; the train loop grows it on
    # overflow exactly like instance_cap.
    staircase_cull: bool = True
    row_cap: int = 0
    debug: bool = False
    # jax.profiler capture window (Perfetto/TensorBoard traces); off when
    # profile_num_steps == 0.  Trace lands in <model_path>/trace unless
    # profile_dir is set.
    profile_from_iter: int = 100
    profile_num_steps: int = 0
    profile_dir: str = ""


@dataclass
class OptimizationParams:
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.025
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    normal_lr: float = 0.001
    percent_dense: float = 0.001
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    densify_abs_grad_threshold: float = 0.0008
    abs_split_radii2D_threshold: float = 20.0
    max_abs_split_points: int = 50_000
    max_all_points: int = 5_000_000
    opacity_cull_threshold: float = 0.05
    single_view_weight: float = 0.03
    single_view_weight_from_iter: int = 7000
    multi_view_weight_from_iter: int = 7000
    exposure_compensation: bool = False
    random_background: bool = False
    learnt_normal: bool = True
    buffer_length: int = 4
    depth_error_threshold: float = 0.01
    photo_ssim_weight: float = 1.0
    photo_weight: float = 0.3
    use_color_aggregation: bool = True
    enable_exposure_correction: bool = False
    number_src_frames: int = 4
    nb_visible_src_frames: int = 3
    start_color_aggregation_iter: int = 10_000
    color_aggregate_burnin_steps: int = 3000
    color_aggregation_reduce_lr_iter: List[int] = field(
        default_factory=lambda: [18_000, 25_000])
    shuffle_source_frame: bool = False
    residual_resolution_scale: float = 1.0
    opacity_decay: float = 1.0
    opacity_decay_interval: int = 50
    feat_aggregate_mode: str = "mean"
    enable_mix_precision: bool = True


def add_group(parser: argparse.ArgumentParser, dc_cls, shorthand=()):
    g = parser.add_argument_group(dc_cls.__name__)
    for f in dataclasses.fields(dc_cls):
        flags = [f"--{f.name}"]
        if f.name in shorthand:
            flags.append(f"-{f.name[0]}")
        if f.type in ("bool", bool):
            g.add_argument(*flags, action="store_true",
                           default=f.default)
        elif f.type in ("List[int]",):
            g.add_argument(*flags, nargs="+", type=int,
                           default=f.default_factory())
        else:
            typ = {int: int, float: float, str: str,
                   "int": int, "float": float, "str": str}[f.type]
            g.add_argument(*flags, type=typ, default=f.default)
    return g


def extract(args, dc_cls):
    names = {f.name for f in dataclasses.fields(dc_cls)}
    return dc_cls(**{k: v for k, v in vars(args).items() if k in names})


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    add_group(p, ModelParams, shorthand=("source_path", "model_path",
                                         "resolution", "white_background",
                                         "images"))
    add_group(p, OptimizationParams)
    add_group(p, PipelineParams)
    return p


def save_config(args, model_path: str):
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)


def load_combined(parser: argparse.ArgumentParser, argv=None):
    """Merge saved training config with CLI flags (eval-time), mirroring
    reference get_combined_args."""
    args = parser.parse_args(argv)
    cfg_path = os.path.join(args.model_path, "cfg_args.json")
    if os.path.exists(cfg_path):
        saved = json.load(open(cfg_path))
        merged = dict(saved)
        defaults = {a.dest: parser.get_default(a.dest)
                    for g in parser._action_groups for a in g._group_actions}
        for k, v in vars(args).items():
            if k not in merged or v != defaults.get(k):
                merged[k] = v
        args = argparse.Namespace(**merged)
    return args
