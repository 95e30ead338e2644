#!/usr/bin/env python
"""Export VGG16 + LPIPS linear-head weights to the .npz layout consumed by
ibgs_tpu/eval/lpips.py.  Run on a machine WITH network access:

    pip install torch torchvision lpips
    python scripts/export_lpips_weights.py --out lpips_vgg.npz

then point $IBGS_LPIPS_WEIGHTS at the file.
"""
import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="lpips_vgg.npz")
    args = p.parse_args(argv)
    import lpips as lpips_pkg
    import torch
    net = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    ci = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{ci}_w"] = m.weight.detach().numpy()
            out[f"conv{ci}_b"] = m.bias.detach().numpy()
            ci += 1
    for j, lin in enumerate(net.lins):
        out[f"lin{j}_w"] = lin.model[1].weight.detach().numpy()[0, :, 0, 0]
    np.savez(args.out, **out)
    print("wrote", args.out, "convs:", ci)


if __name__ == "__main__":
    main()
