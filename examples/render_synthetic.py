"""Drive the public API end-to-end on a synthetic scene and save a PNG.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python examples/render_synthetic.py --out /tmp/r.png

Renders a colored grid of Gaussians with the full IBGS geometry path
(plane depths, median buffer, source warping) through both backends,
checks they agree, checks gradient finiteness, and writes the image.
"""
import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/render_synthetic.png")
    ap.add_argument("--size", type=int, nargs=2, default=(128, 96))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ibgs_tpu.models.gaussians import init_from_points
    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.renderer import render_view
    from tests.utils import simple_camera

    W, H = args.size
    g = np.mgrid[-3:4, -3:4].reshape(2, -1).T.astype(np.float32) * 0.22
    pts = np.concatenate([g, np.full((len(g), 1), 0.0, np.float32)], axis=1)
    pts[:, 2] += 0.05 * np.sin(3 * pts[:, 0])
    cols = np.stack([(g[:, 0] + 1) / 2 % 1, (g[:, 1] + 1) / 2 % 1,
                     np.full(len(g), 0.6)], axis=1).astype(np.float32)
    model = init_from_points(pts, cols, max_sh_degree=2)
    cam = simple_camera(W, H)
    S = 2
    rng = np.random.default_rng(0)
    src = SourceViews(
        images=jnp.asarray(rng.random((S, H, W, 3)), jnp.float32),
        depths=jnp.full((S, H, W), 3.0, jnp.float32),
        ref_to_src=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
        cam_pos=jnp.asarray(rng.random((S, 3)) * 0.1, jnp.float32),
        count=jnp.int32(S),
    )
    bg = jnp.array([0.1, 0.1, 0.15])

    outs = {}
    for backend in ("oracle", "pallas"):
        cfg = RasterConfig(instance_cap=1 << 14, backend=backend)
        res, dnormal = render_view(model, cam, cfg, bg, src=src,
                                   render_geo=True)
        outs[backend] = res
        print(f"[{backend}] render mean={float(res.render.mean()):.4f} "
              f"median_depth mean={float(res.median_depth.mean()):.3f} "
              f"n_instances={int(res.n_instances)}")

    a, b = outs["oracle"], outs["pallas"]
    np.testing.assert_allclose(np.asarray(b.render), np.asarray(a.render),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.median_depth),
                               np.asarray(a.median_depth), rtol=1e-3,
                               atol=1e-4)
    print("backend parity OK")

    depth = np.asarray(a.median_depth)
    covered = np.asarray(a.final_t) < 0.9   # init opacity is 0.1 (3DGS)
    assert covered.any(), "no splat coverage"
    d = depth[covered]
    assert 2.0 < d.mean() < 4.0, f"depth off: {d.mean()}"  # camera at z≈3

    def loss(xyz):
        cfg = RasterConfig(instance_cap=1 << 14, backend="pallas")
        m = model.replace(params=model.params.replace(xyz=xyz))
        r, _ = render_view(m, cam, cfg, bg, src=src, render_geo=True)
        return r.render.mean() + r.median_depth.mean() * 1e-3

    gx = jax.grad(loss)(model.params.xyz)
    assert np.isfinite(np.asarray(gx)).all(), "non-finite grads"
    print(f"grad finite OK  |dxyz| max={float(jnp.abs(gx).max()):.2e}")

    img = np.clip(np.asarray(a.render) * 255, 0, 255).astype(np.uint8)
    try:
        from PIL import Image
        Image.fromarray(img).save(args.out)
        print(f"wrote {args.out}")
    except ImportError:
        np.save(args.out + ".npy", img)
        print(f"PIL unavailable; wrote {args.out}.npy")


if __name__ == "__main__":
    sys.exit(main())
