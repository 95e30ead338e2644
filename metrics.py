#!/usr/bin/env python
"""Metrics CLI (reference metrics.py UX): PSNR/SSIM/LPIPS over renders.

    python metrics.py -m <model_dir>
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True, nargs="+")
    args = p.parse_args(argv)
    from ibgs_tpu.eval.metrics import evaluate_model_dir
    for mp in args.model_path:
        print("evaluating", mp)
        results = evaluate_model_dir(mp)
        for k, v in results.items():
            print(f"  {k}: PSNR {v['psnr']:.3f}  SSIM {v['ssim']:.4f}  "
                  f"LPIPS {v['lpips']}")


if __name__ == "__main__":
    main()
