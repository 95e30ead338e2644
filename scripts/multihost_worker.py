#!/usr/bin/env python
"""One process of the multi-host GSP exactness check (SURVEY §2.5 /
VERDICT r2 #4: execute `jax.distributed` with >1 process for real).

Each worker joins the process group, builds the global mesh over BOTH
processes' CPU devices, and runs the Gaussian-sharded render whose
instance all_to_all crosses the process boundary.  It then verifies its
OWN addressable row bands bit-match a locally-computed replicated render.

Launch (tests/test_multihost.py spawns two of these):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/multihost_worker.py \
        --coordinator localhost:12355 --nproc 2 --pid {0,1} [--devices 4]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--devices", type=int, default=4,
                    help="CPU devices per process")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_num_cpu_devices", args.devices)

    from ibgs_tpu.parallel import distributed
    multi = distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.nproc,
                                   process_id=args.pid)
    assert multi, "expected a multi-process group"
    assert jax.process_count() == args.nproc
    n_dev = len(jax.devices())
    assert n_dev == args.nproc * args.devices, n_dev

    import jax.numpy as jnp
    import numpy as np

    from ibgs_tpu.models.gaussians import init_from_points
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.parallel.gsp import gsp_render
    from ibgs_tpu.renderer import render_view
    from tests.utils import simple_camera

    # identical scene on every process (the data plane is deterministic)
    W, H, n = 32, 16 * n_dev, 300
    rng = np.random.default_rng(0)
    pts = (rng.random((n, 3)) * 1.2 - 0.6).astype(np.float32)
    model = init_from_points(pts, rng.random((n, 3)).astype(np.float32),
                             max_sh_degree=1, capacity=512)
    cam = simple_camera(W, H)
    cfg = RasterConfig(instance_cap=8192, backend="oracle")

    mesh = distributed.global_mesh(1, n_dev, axis_names=("dp", "gs"))
    img, ovf = gsp_render(model, cam, cfg, mesh, cap_local=4096,
                          exchange_cap=2048, bg=jnp.array([0.2, 0.3, 0.4]))
    assert int(ovf) == 0, int(ovf)

    # replicated reference, computed fully locally on this process
    ref, _ = render_view(model, cam, cfg, jnp.array([0.2, 0.3, 0.4]),
                         render_geo=False, return_depth_normal=False)
    ref = np.asarray(ref.render)

    band = H // n_dev
    max_err, checked = 0.0, 0
    for shard in img.addressable_shards:
        r0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        want = ref[r0:r0 + band]
        max_err = max(max_err, float(np.abs(got - want).max()))
        checked += 1
    assert checked == args.devices, checked
    assert max_err < 1e-5, max_err
    print(f"MULTIHOST_OK pid={args.pid} procs={jax.process_count()} "
          f"devices={n_dev} bands_checked={checked} max_err={max_err:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
