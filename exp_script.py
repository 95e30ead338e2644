#!/usr/bin/env python
"""Benchmark-suite runner (reference exp_script.py): chains
train → render → metrics over the standard scene suites with their
per-dataset flags.

    python exp_script.py --data_root /data --out_root ./output \
        [--suites m360_indoor m360_outdoor db shiny tnt]
"""
import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SUITES = {
    "m360_indoor": dict(
        scenes=["bonsai", "counter", "kitchen", "room"],
        flags=["-r", "2", "--eval"]),
    "m360_outdoor": dict(
        scenes=["bicycle", "flowers", "garden", "stump", "treehill"],
        flags=["-r", "4", "--eval"]),
    "db": dict(
        scenes=["drjohnson", "playroom"],
        flags=["-r", "1", "--eval", "--multi_view_max_angle", "50",
               "--multi_view_max_dis", "4.5"]),
    "shiny": dict(
        scenes=["guitars", "lab", "cd"],
        flags=["-r", "1008", "--eval", "--multi_view_max_angle", "50",
               "--multi_view_max_dis", "4.5"]),
    "tnt": dict(
        scenes=["train", "truck"],
        flags=["-r", "2", "--eval", "--exposure_compensation",
               "--enable_exposure_correction"]),
}


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--out_root", default="./output")
    p.add_argument("--suites", nargs="+", default=list(SUITES))
    p.add_argument("--scenes", nargs="+", default=None,
                   help="explicit scene dirs under data_root (bypasses "
                        "--suites; flags come from --extra only)")
    p.add_argument("--extra", nargs="*", default=[])
    # unknown flags pass through to train.py (argparse's nargs="*" refuses
    # tokens that look like options, so `--extra --eval ...` lands here)
    args, unknown = p.parse_known_args(argv)
    args.extra = list(args.extra) + list(unknown)
    py = sys.executable
    if args.scenes:
        suites = {"custom": dict(scenes=args.scenes, flags=[])}.items()
    else:
        suites = ((s, SUITES[s]) for s in args.suites)
    for suite, cfg in suites:
        for scene in cfg["scenes"]:
            src = os.path.join(args.data_root, scene)
            out = os.path.join(args.out_root, suite, scene)
            run([py, os.path.join(HERE, "train.py"), "-s", src, "-m", out,
                 *cfg["flags"], *args.extra])
            run([py, os.path.join(HERE, "render.py"), "-m", out,
                 "--skip_train"])
            run([py, os.path.join(HERE, "metrics.py"), "-m", out])


if __name__ == "__main__":
    main()
