#!/usr/bin/env python
"""GSP (Gaussian-sharded compute) work-scaling sweep on a virtual mesh.

Multi-chip hardware is not available in this image, so wall-clock scaling
cannot be measured; what CAN be verified is the property that makes the
design scale (SURVEY §2.5): per-device WORK — Gaussians preprocessed,
instances binned, rows exchanged — falls as P/n_dev while the result stays
exact vs the replicated renderer.  Run:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/gsp_scaling.py

Prints one JSON line per mesh size; paste the table into BASELINE.md.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    from ibgs_tpu.models.gaussians import init_from_points
    from ibgs_tpu.ops import preprocess as pp
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.parallel.gsp import gsp_render
    from ibgs_tpu.parallel.sharding import make_mesh
    from ibgs_tpu.renderer import render_view
    from tests.utils import simple_camera

    W, H, n = 64, 128, 2000
    rng = np.random.default_rng(0)
    pts = (rng.random((n, 3)) * 1.2 - 0.6).astype(np.float32)
    model = init_from_points(pts, rng.random((n, 3)).astype(np.float32),
                             max_sh_degree=1, capacity=2048)
    cam = simple_camera(W, H)
    cfg = RasterConfig(instance_cap=65536, backend="oracle")

    ref, _ = render_view(model, cam, cfg, jnp.zeros(3), render_geo=False,
                         return_depth_normal=False)
    ref = np.asarray(ref.render)

    # total instances for the whole scene (the replicated cost per device)
    nw, off = model.oriented_normal(cam.cam_pos, learnt=True)
    sp = pp.preprocess(model.params.xyz, model.scale, model.quat_unit,
                       model.opacity, model.sh_coeffs,
                       model.active_sh_degree, nw, off, cam,
                       cfg.tile_h, cfg.tile_w, alive=model.alive)
    total_inst = int(jnp.where(sp.n_tiles > 0, sp.n_tiles, 0).sum())

    # --time additionally records the wall-clock scaling protocol
    # (BASELINE.json >=0.8 efficiency target): K chained renders per mesh
    # size, efficiency = t(1) / (t(n)) — on this image the 8 virtual CPU
    # devices share one host's cores, so the numbers measure PROTOCOL
    # readiness, not ICI scaling; re-run unchanged on a real pod slice.
    do_time = "--time" in sys.argv
    t_base = None
    for gs in (1, 2, 4, 8):
        mesh = make_mesh(1, gs, axis_names=("dp", "gs"))
        img, ovf = gsp_render(model, cam, cfg, mesh,
                              cap_local=-(-65536 // gs),
                              exchange_cap=-(-65536 // (gs * gs)),
                              bg=jnp.zeros(3))
        err = float(np.abs(np.asarray(img) - ref).max())
        row = {
            "gs": gs,
            "gaussians_per_device": model.capacity // gs,
            "instances_binned_per_device_cap": -(-65536 // gs),
            "exchange_rows_per_pair_cap": -(-65536 // (gs * gs)),
            "total_scene_instances": total_inst,
            "overflow": int(ovf),
            "max_err_vs_replicated": err,
            "exact": bool(err < 1e-5),
        }
        if do_time:
            import time

            from ibgs_tpu.parallel.gsp import make_gsp_render
            rfn = make_gsp_render(W, H, cfg, mesh,
                                  cap_local=-(-65536 // gs),
                                  exchange_cap=-(-65536 // (gs * gs)))
            for _ in range(2):                      # warm the trace cache
                jax.block_until_ready(rfn(model, cam, jnp.zeros(3))[0])
            t0 = time.perf_counter()
            K = 10
            for _ in range(K):
                jax.block_until_ready(rfn(model, cam, jnp.zeros(3))[0])
            dt = (time.perf_counter() - t0) / K
            t_base = t_base or dt
            row.update(wall_ms=round(dt * 1e3, 2),
                       rays_per_s=round(W * H / dt, 0),
                       efficiency_vs_1dev=round(t_base / dt, 3))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
