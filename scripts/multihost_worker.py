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
    ap.add_argument("--train", action="store_true",
                    help="also run one FULL-objective GSP training step "
                         "across the process group")
    ap.add_argument("--dp", type=int, default=1,
                    help="dp axis size for the --train step (dp camera "
                         "batch; the dp grad psum crosses the process "
                         "boundary when dp rows span processes)")
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

    if args.train:
        # one FULL-objective GSP training step across the process group:
        # every process feeds the SAME host arrays (jit replicates them to
        # the global mesh; the shard_map in_specs reshard as needed), the
        # gs instance all_to_all and band all_gathers cross the process
        # boundary, and the replicated loss must be identical on both
        # processes.
        from ibgs_tpu.config import OptimizationParams
        from ibgs_tpu.models import aggregation
        from ibgs_tpu.parallel.gsp import gsp_full_train_step
        from ibgs_tpu.parallel.sharding import _cam_stack
        from ibgs_tpu.train.trainer import (SideOptState, StepPhase,
                                            TrainState)

        S = 2
        opt = OptimizationParams(
            use_color_aggregation=True, number_src_frames=S,
            nb_visible_src_frames=S, single_view_weight_from_iter=0,
            multi_view_weight_from_iter=0, start_color_aggregation_iter=0,
            position_lr_max_steps=100)
        phase = StepPhase(render_geo=True, use_aggregation=True)
        net = aggregation.ColorFusionResidualNet(
            feat_aggregate_mode=opt.feat_aggregate_mode)
        net_params = net.init(jax.random.PRNGKey(0),
                              jnp.zeros((H, W, S, 7)), jnp.zeros((H, W, 3)),
                              jnp.zeros((H, W, 3)))
        state = TrainState(
            model=model, app_ab=jnp.zeros((1600, 2), jnp.float32),
            app_opt=SideOptState.init(jnp.zeros((1600, 2))),
            net_params=net_params, net_opt=SideOptState.init(net_params),
            spatial_lr_scale=jnp.float32(1.0))
        dp = args.dp
        gs = n_dev // dp
        mesh_t = (mesh if dp == 1
                  else distributed.global_mesh(dp, gs,
                                               axis_names=("dp", "gs")))
        # band height must split over the (smaller) gs axis
        Ht = 16 * gs
        cam_t = simple_camera(W, Ht)
        gstep = gsp_full_train_step(opt, cfg, net, phase, mesh_t, W, Ht,
                                    cap_local=4096, exchange_cap=2048)
        srcs_np = np.asarray(rng.random((dp, S, Ht, W, 3)), np.float32)
        from ibgs_tpu.ops.epilogue import SourceViews
        srcs = SourceViews(
            images=jnp.asarray(srcs_np),
            depths=jnp.full((dp, S, Ht, W), 3.0, jnp.float32),
            ref_to_src=jnp.tile(jnp.eye(4)[None, None], (dp, S, 1, 1)),
            cam_pos=jnp.zeros((dp, S, 3)),
            count=jnp.full((dp,), S, jnp.int32))
        gts = jnp.asarray(rng.random((dp, Ht, W, 3)), jnp.float32)
        net_params_t = (net_params if Ht == H else net.init(
            jax.random.PRNGKey(0), jnp.zeros((Ht, W, S, 7)),
            jnp.zeros((Ht, W, 3)), jnp.zeros((Ht, W, 3))))
        state = state.replace(net_params=net_params_t,
                              net_opt=SideOptState.init(net_params_t))
        s2, aux = gstep(state, _cam_stack([cam_t] * dp),
                        jnp.zeros((dp,), jnp.int32), gts, srcs,
                        jnp.int32(5), jnp.zeros(3), jnp.bool_(True),
                        jnp.float32(1.0), jnp.float32(1e-4))
        loss = float(aux["loss"])            # replicated → readable
        assert np.isfinite(loss), loss
        assert int(aux["n_overflow"]) == 0
        print(f"MULTIHOST_TRAIN_OK pid={args.pid} loss={loss:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
