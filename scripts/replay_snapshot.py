"""Replay a debug-mode snapshot (train/loop.py snapshot_fw.npz) and
localize non-finite gradients: which loss term, which parameter leaves,
which Gaussian rows.

The snapshot carries the poisoned step's exact inputs — pre-step params,
the camera index into the (deterministic) synthetic scene, the gt image
and the source pack including the EVOLVED depth cache.  This script
rebuilds the render, takes grads of each loss term separately, and prints
per-leaf non-finite counts plus the offending rows' parameter values.

    python scripts/replay_snapshot.py /tmp/run/snapshot_fw.npz [WxH]
Env: REPLAY_BACKEND=oracle|pallas (default: pallas on TPU, oracle on CPU),
     REPLAY_GT/SEED_PTS/VIEWS mirror scripts/tpu_prod_run.py's scene.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    snap_path = sys.argv[1]
    d = np.load(snap_path)
    W, H = (int(x) for x in (sys.argv[2].split("x")
                             if len(sys.argv) > 2 else ("960", "544")))

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from ibgs_tpu.data.synthetic import make_synthetic_scene
    from ibgs_tpu.models.gaussians import GaussianModel, GaussianParams
    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu import renderer
    from ibgs_tpu.train import losses

    it = int(d["iter"])
    cam_idx = int(d["cam_idx"])
    print(f"snapshot: iter {it} cam {cam_idx} "
          f"nonfinite_grads={int(d.get('nonfinite_grads', -1))}")

    scene = make_synthetic_scene(
        n_views=int(os.environ.get("REPLAY_VIEWS", 16)), width=W, height=H,
        n_gt=int(os.environ.get("REPLAY_GT", 150_000)),
        n_seed=int(os.environ.get("REPLAY_SEED_PTS", 20_000)), eval_every=8)
    cam = scene.train_cameras[cam_idx]

    params = GaussianParams(
        xyz=jnp.asarray(d["xyz"]), sh_dc=jnp.asarray(d["sh_dc"]),
        sh_rest=jnp.asarray(d["sh_rest"]),
        log_scale=jnp.asarray(d["log_scale"]), quat=jnp.asarray(d["quat"]),
        opacity_logit=jnp.asarray(d["opacity_logit"]),
        normal=jnp.asarray(d["normal"]), offset=jnp.asarray(d["offset"]))
    alive = jnp.asarray(d["alive"])
    P = params.xyz.shape[0]
    zeros = jax.tree.map(jnp.zeros_like, params)
    zp = jnp.zeros((P,), jnp.float32)
    model = GaussianModel(
        params=params, mu=zeros, nu=zeros, step=jnp.int32(it),
        alive=alive, max_radii2d=zp, grad_accum=zp, grad_accum_abs=zp,
        denom=zp, denom_abs=zp,
        active_sh_degree=jnp.int32(min(it // 1000, 2)), max_sh_degree=2)

    # input health first
    for name in ("xyz", "log_scale", "quat", "opacity_logit", "normal",
                 "offset", "sh_dc", "sh_rest"):
        a = d[name][np.asarray(alive)]
        nf = (~np.isfinite(a)).sum()
        if a.size and np.isfinite(a).any():
            print(f"  in[{name}]: nonfinite {nf}  min {np.nanmin(a):.4g} "
                  f"max {np.nanmax(a):.4g}")
        else:
            # zero alive rows / all-NaN leaf: exactly the degenerate
            # snapshots this tool triages — don't die on the report line
            print(f"  in[{name}]: nonfinite {nf}  (no finite elements)")

    src = SourceViews(
        images=jnp.asarray(d["src_images"]),
        depths=jnp.asarray(d["src_depths"]),
        ref_to_src=jnp.asarray(d["src_ref_to_src"]),
        cam_pos=jnp.asarray(d["src_cam_pos"]),
        count=jnp.asarray(d["src_count"]))
    gt = jnp.asarray(d["gt"])
    bg = jnp.asarray(d["bg"])

    backend = ("oracle" if jax.default_backend() == "cpu"
               else os.environ.get("REPLAY_BACKEND", "pallas"))
    cap = int(os.environ.get("REPLAY_CAP", 1 << 19))
    rcfg = RasterConfig(instance_cap=cap, backend=backend,
                        staircase_cull=True, row_cap=cap // 2)

    def render_once(p, sdum, sdum_abs):
        m = model.replace(params=p)
        res, dnormal = renderer.render_view(
            m, cam, rcfg, bg, src=src, learnt_normal=True,
            render_geo=True, return_depth_normal=True,
            screen_dummy=sdum, screen_dummy_abs=sdum_abs)
        return res, dnormal

    def term_fns():
        def image_term(p, sd, sda):
            res, _ = render_once(p, sd, sda)
            return losses.dssim_l1(res.render, gt)

        def normal_term(p, sd, sda):
            res, dnormal = render_once(p, sd, sda)
            return losses.normal_consistency(res.normal, dnormal, 1.0)

        def photo_term(p, sd, sda):
            res, _ = render_once(p, sd, sda)
            nb = 3
            warped = res.ibr.warped_image[:nb]
            feat = res.ibr.cam_feat[:nb]
            valid = feat.sum(-1) > 0.0
            return losses.multi_view_photometric(gt, warped, valid,
                                                 0.5, 0.3)

        return [("image", image_term), ("normal", normal_term),
                ("photo", photo_term)]

    sdum = jnp.zeros((P, 2), jnp.float32)
    leaf_names = ("xyz", "sh_dc", "sh_rest", "log_scale", "quat",
                  "opacity_logit", "normal", "offset")
    for name, fn in term_fns():
        val, (gp, gsd, gsda) = jax.value_and_grad(
            fn, argnums=(0, 1, 2))(params, sdum, sdum)
        print(f"term {name}: value {float(val):.6g}")
        bad_rows = np.zeros((P,), bool)
        for ln in leaf_names:
            g = np.asarray(getattr(gp, ln))
            nf = ~np.isfinite(g)
            cnt = int(nf.sum())
            if cnt:
                rows = nf.reshape(P, -1).any(-1)
                bad_rows |= rows
                print(f"  grad[{ln}]: {cnt} non-finite in "
                      f"{int(rows.sum())} rows")
        for gname, g in (("screen_dummy", gsd), ("screen_dummy_abs", gsda)):
            g = np.asarray(g)
            nf = ~np.isfinite(g)
            if nf.any():
                bad_rows |= nf.reshape(P, -1).any(-1)
                print(f"  grad[{gname}]: {int(nf.sum())} non-finite")
        idx = np.nonzero(bad_rows)[0]
        if idx.size:
            print(f"  offending rows ({idx.size}): {idx[:10]}")
            for i in idx[:5]:
                print(f"    row {i}: alive={bool(d['alive'][i])} "
                      f"xyz={d['xyz'][i]} log_scale={d['log_scale'][i]} "
                      f"quat={d['quat'][i]} "
                      f"op={d['opacity_logit'][i]} "
                      f"normal={d['normal'][i]} offset={d['offset'][i]}")


if __name__ == "__main__":
    main()
