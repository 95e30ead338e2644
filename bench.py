"""Benchmark: pixels/s/chip for a full differentiable IBGS render step.

Measures the north-star metric (BASELINE.json): forward+backward throughput
of the plane-based rasterizer with the image-based warping path, on
whatever accelerator is attached.  The DEFAULT run measures the 960x544
continuity point (rounds 2-4) AND the declared north-star resolution
(1080p = 1920x1088); when a converged-checkpoint bundle
(`bench_bundle.npz`, written by scripts/make_bench_bundle.py from a real
training run) is present at the repo root it ALSO measures the converged
scene — realistic opacity distribution, i.e. the blend-early-exit regime
the reference operates in — and that 1080p converged number is the
headline.  Config list is trimmed, never reordered, if the run goes cold
past BENCH_BUDGET_S (so the driver's timeout is never at risk; each
successive config is only attempted while under budget).

Timing methodology (CLAUDE.md): the remote-TPU relay adds ~20-30 ms of
per-dispatch latency and `block_until_ready` through it under-reports, so
iterations are chained INSIDE one jit via `lax.fori_loop` with a data
dependency between steps, and the chain returns a scalar whose D2H copy
forces completion.  The trip count is a TRACED argument (round-5, VERDICT
r4 #6): with a static count XLA is free to unroll the while loop and the
chained program's cold compile ran +115.6 s beyond the plain fwd+bwd
graph; a dynamic bound pins one while-body compile for every chain
length.  We take the min over several chain runs to reject
relay-congestion flukes (observed 580 ms <-> 2600 ms swings).

Scene selection env:
  * BENCH_N=<n> scales the random-scene splat count (e.g. 1_000_000 for
    the reference-operating-point probe) — snug caps are AUTO-MEASURED
    with a loose-cap count pass (n_instances/n_rows are pre-truncation
    totals, so one pass suffices at any cap);
  * BENCH_CKPT=<bundle.npz> measures ONLY the converged bundle;
  * BENCH_W/BENCH_H pin a single resolution;
  * BENCH_MODE=render measures the forward-only serving path.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

import numpy as np

# Baseline scale: the reference paper-era CUDA rasterizer trains ~10-15
# it/s at 960x544-class resolution on a consumer GPU ≈ 6e6 px/s fwd+bwd.
# No published numbers exist (BASELINE.md), so vs_baseline is against
# that estimate (honest uncertainty at least ±2x).
BASELINE_PIX_S = 6.0e6


def _round_up(x, m):
    return -(-int(x) // m) * m


def _model_from_raw(raw, capacity):
    import jax.numpy as jnp
    from ibgs_tpu.models.gaussians import init_from_points

    n = raw["xyz"].shape[0]
    n_rest = raw["sh_rest"].shape[1]
    deg = {0: 0, 3: 1, 8: 2, 15: 3}[n_rest]
    model = init_from_points(np.zeros((4, 3), np.float32),
                             np.zeros((4, 3), np.float32),
                             max_sh_degree=deg, capacity=capacity)

    def fill(dst, src):
        out = np.zeros_like(np.asarray(dst))
        out[:n] = src.reshape(out[:n].shape)
        return jnp.asarray(out)

    return model.replace(
        params=model.params.replace(
            xyz=fill(model.params.xyz, raw["xyz"]),
            sh_dc=fill(model.params.sh_dc, raw["sh_dc"]),
            sh_rest=fill(model.params.sh_rest, raw["sh_rest"]),
            log_scale=fill(model.params.log_scale, raw["log_scale"]),
            quat=fill(model.params.quat, raw["quat"]),
            opacity_logit=fill(model.params.opacity_logit,
                               raw["opacity_logit"]),
            normal=fill(model.params.normal, raw["normal"]),
            offset=fill(model.params.offset, raw["offset"])),
        alive=jnp.arange(capacity) < n,
        active_sh_degree=jnp.int32(deg),
    )


def _resize_hwc(img, H, W):
    import jax
    import jax.numpy as jnp
    with jax.default_device(jax.devices("cpu")[0]):
        shape = (img.shape[:-3] + (H, W) + img.shape[-1:]
                 if img.ndim >= 3 else (H, W))
        return np.asarray(jax.image.resize(jnp.asarray(img), shape,
                                           method="bilinear"))


def main():
    import jax

    # Persistent compile cache: the Mosaic remote-compile service can take
    # minutes per kernel (and occasionally degrades to ~10 min for trivial
    # programs); a warm cache makes re-runs of this exact bench compile in
    # seconds.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(_ROOT, ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp
    from jax import lax

    from ibgs_tpu.models.gaussians import init_from_points
    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.renderer import render_view
    from ibgs_tpu.train import losses
    from tests.utils import simple_camera

    iters = int(os.environ.get("BENCH_ITERS", 5))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 420))
    backend = "oracle" if jax.default_backend() == "cpu" else "pallas"
    mixp = os.environ.get("BENCH_MIXP", "1") == "1"
    stair = os.environ.get("BENCH_STAIR", "1") == "1"
    # 16x32 tiles measured fastest on v5e at the bench scene (fwd+bwd
    # 119.0 ms vs 128.0 at 16x16, 120.5 at 32x32, 159.8 at 8x16): the
    # kernel is issue-bound per 128-instance substep, so fewer, wider
    # tiles win until the vector work catches up at NP=1024.
    th, tw = (int(x) for x in os.environ.get("BENCH_TILE", "16x32").split("x"))
    # BENCH_MODE=render: forward-only serving path (the reference's FPS
    # benchmark analog, render.py:126-155); default is fwd+bwd.
    mode = os.environ.get("BENCH_MODE", "train")
    S = 4
    n = int(os.environ.get("BENCH_N", 100_000))
    rng = np.random.default_rng(0)

    def build_random_model():
        # snug capacity mirrors converged training (~1.3x headroom over
        # alive splats) — padding rows in P-sized sorts/scans/gathers cost
        # exactly like real ones
        capacity = int(os.environ.get(
            "BENCH_CAPACITY", _round_up(1.31 * n, 1024)))
        r = np.random.default_rng(0)
        pts = (r.random((n, 3)) * 2.0 - 1.0).astype(np.float32)
        pts[:, 2] *= 0.3
        cols = r.random((n, 3)).astype(np.float32)
        return init_from_points(pts, cols, max_sh_degree=2,
                                capacity=capacity), n

    def build_bundle_model(bundle):
        n_b = bundle["xyz"].shape[0]
        capacity = int(os.environ.get(
            "BENCH_CAPACITY", _round_up(1.31 * n_b, 1024)))
        return _model_from_raw(bundle, capacity), n_b

    def make_inputs(bundle, W, H):
        """Camera + source pack + gt at a target resolution."""
        if bundle is not None:
            from ibgs_tpu.core.camera import make_camera
            cam = make_camera(bundle["cam_R"], bundle["cam_t"],
                              float(bundle["fovx"]), float(bundle["fovy"]),
                              W, H)
            bh, bw = bundle["gt"].shape[:2]
            if (bh, bw) == (H, W):
                imgs, deps, gt_ = (bundle["src_images"],
                                   bundle["src_depths"], bundle["gt"])
            else:
                imgs = _resize_hwc(bundle["src_images"], H, W)
                deps = np.stack(
                    [_resize_hwc(d[..., None], H, W)[..., 0]
                     for d in bundle["src_depths"]])
                gt_ = _resize_hwc(bundle["gt"], H, W)
            src = SourceViews(
                images=jnp.asarray(imgs, jnp.float32),
                depths=jnp.asarray(deps, jnp.float32),
                ref_to_src=jnp.asarray(bundle["src_ref_to_src"],
                                       jnp.float32),
                cam_pos=jnp.asarray(bundle["src_cam_pos"], jnp.float32),
                count=jnp.int32(int(bundle["src_count"])))
            return cam, src, jnp.asarray(gt_, jnp.float32)
        cam = simple_camera(W, H)
        src = SourceViews(
            images=jnp.asarray(rng.random((S, H, W, 3)), jnp.float32),
            depths=jnp.full((S, H, W), 3.0, jnp.float32),
            ref_to_src=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
            cam_pos=jnp.asarray(rng.random((S, 3)) * 0.1, jnp.float32),
            count=jnp.int32(S))
        gt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
        return cam, src, gt

    def measure_counts(model, cam):
        """Pre-truncation instance/row totals from one loose forward render
        (RenderResult.n_instances/n_rows are counted BEFORE the cap clamp,
        so any cap returns the true totals)."""
        loose = RasterConfig(
            instance_cap=1 << 20, backend=backend, mix_precision=mixp,
            tile_h=th, tile_w=tw, staircase_cull=stair, row_cap=1 << 19)

        @jax.jit
        def counts(params):
            m = model.replace(params=params)
            res, _ = render_view(m, cam, loose, jnp.zeros(3), src=None,
                                 render_geo=False, return_depth_normal=False)
            return res.n_instances, res.n_rows

        ni, nr = counts(model.params)
        return int(ni), int(nr)

    def snug_caps(model, bundle, W, H):
        """(cap, rowcap): the measured snug defaults for the standard
        100k random scene, else auto-measured (loose count pass)."""
        env_cap = os.environ.get("BENCH_CAP")
        env_row = os.environ.get("BENCH_ROWCAP")
        if env_cap:
            return int(env_cap), int(env_row or 0)
        std = bundle is None and n == 100_000 and th == 16 and tw == 32
        if std and (W, H) == (960, 544):
            # measured: staircase 524,208 instances / 250,391 rows
            return (629_000, 301_000) if stair else (707_000, 0)
        if std and (W, H) == (1920, 1088):
            # measured: staircase 1,282,557 instances / 399,412 rows
            return (1_539_000, 479_000) if stair else (3_100_000, 0)
        cam, _, _ = make_inputs(bundle, W, H)
        ni, nr = measure_counts(model, cam)
        cap = _round_up(max(1.2 * ni, 4096), 1024)
        rowcap = _round_up(max(1.2 * nr, 4096), 1024) if stair else 0
        print(f"# autocap {W}x{H}: {ni} instances / {nr} rows -> "
              f"cap {cap} rowcap {rowcap}", file=sys.stderr, flush=True)
        return cap, rowcap

    def run_config(model, bundle, n_splats, label, W, H):
        cap, rowcap = snug_caps(model, bundle, W, H)
        cam, src, gt = make_inputs(bundle, W, H)
        cfg = RasterConfig(instance_cap=cap, backend=backend,
                           mix_precision=mixp, tile_h=th, tile_w=tw,
                           staircase_cull=stair, row_cap=rowcap)

        def loss_fn(params, src, gt):
            m = model.replace(params=params)
            res, _ = render_view(m, cam, cfg, jnp.zeros(3), src=src,
                                 render_geo=True, return_depth_normal=False)
            return (losses.dssim_l1(res.render, gt)
                    + 0.1 * jnp.abs(res.ibr.warped_image).mean()
                    + 1e-3 * res.median_depth.mean())

        grad_fn = jax.grad(lambda p, e, src, gt: loss_fn(
            p.replace(xyz=p.xyz + e), src, gt), argnums=0)

        def gnorm(params, eps, src, gt):
            if mode == "render":
                m = model.replace(params=params.replace(
                    xyz=params.xyz + eps))
                res, _ = render_view(m, cam, cfg, jnp.zeros(3), src=src,
                                     render_geo=True,
                                     return_depth_normal=False)
                return (res.render.sum() + res.median_depth.sum()
                        + res.ibr.warped_image.sum())
            g = grad_fn(params, eps, src, gt)
            return sum(jnp.sum(x * x) for x in jax.tree.leaves(g))

        # big arrays enter as jit ARGUMENTS (closed-over constants are
        # inlined into the HLO and blow up the remote-compile request);
        # the trip count is a TRACED argument so the loop cannot be
        # unrolled — one while-body compile for any chain length.
        def chain(params, src, gt, k):
            def body(i, acc):
                # data dependency: eps depends on the running accumulator,
                # so steps cannot be reordered/overlapped away
                eps = acc * 1e-30 + jnp.float32(i) * 1e-7
                return acc + gnorm(params, eps, src, gt)
            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        step = jax.jit(chain)
        t0 = time.time()
        v = float(step(model.params, src, gt, jnp.int32(iters)))
        t_first = time.time() - t0
        assert np.isfinite(v), "bench step produced non-finite grad norm"

        prof_dir = os.environ.get("BENCH_PROFILE")
        if prof_dir:
            from ibgs_tpu.utils.profiling import trace
            with trace(os.path.join(prof_dir, f"{label}_{W}x{H}")):
                float(step(model.params, src, gt, jnp.int32(iters)))

        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(step(model.params, src, gt, jnp.int32(iters)))
            best = min(best, time.time() - t0)
        dt = best / iters
        return {
            "config": label, "resolution": f"{W}x{H}",
            "splats": n_splats,
            "step_ms": round(dt * 1e3, 2),
            "mpix_s": round(H * W / dt / 1e6, 3),
            "vs_baseline": round(H * W / dt / BASELINE_PIX_S, 4),
            "compile_s": round(max(t_first - best, 0.0), 1),
            "cap": cap, "rowcap": rowcap,
        }

    # ---- config list ----
    default_bundle = os.path.join(_ROOT, "bench_bundle.npz")
    ckpt = os.environ.get("BENCH_CKPT", "")
    if os.environ.get("BENCH_W") or os.environ.get("BENCH_H"):
        res_list = [(int(os.environ.get("BENCH_W", 960)),
                     int(os.environ.get("BENCH_H", 544)))]
    else:
        res_list = [(960, 544), (1920, 1088)]

    jobs = []   # (kind, W, H); later entries preferred as headline
    if ckpt:
        jobs += [("ckpt", W, H) for W, H in res_list]
    else:
        jobs += [("random", W, H) for W, H in res_list]
        if os.path.exists(default_bundle) and "BENCH_N" not in os.environ:
            ckpt = default_bundle
            jobs += [("ckpt", W, H) for W, H in res_list]

    bundle = dict(np.load(ckpt)) if ckpt else None
    models = {}

    def get_model(kind):
        if kind not in models:
            models[kind] = (build_bundle_model(bundle) if kind == "ckpt"
                            else build_random_model())
        return models[kind]

    t_start = time.time()
    results = []
    skipped = []
    for kind, W, H in jobs:
        if results and time.time() - t_start > budget_s:
            # cold run: protect the driver's timeout; later rounds rerun
            # warm off the persistent cache and measure the full list
            skipped.append(f"{kind}@{W}x{H}")
            continue
        model, n_splats = get_model(kind)
        label = ("converged" if kind == "ckpt" else "random")
        results.append(run_config(model, bundle if kind == "ckpt" else None,
                                  n_splats, label, W, H))

    head = results[-1]
    kind = "render-only" if mode == "render" else "fwd+bwd"
    scene = "%s %dk splats" % (head["config"], head["splats"] // 1000)
    out = {
        "metric": "%s pixels/s/chip (IBGS geo render, %s, %s)"
                  % (kind, head["resolution"], scene),
        "value": round(head["mpix_s"] * 1e6, 1),
        "unit": "pixels/s",
        "vs_baseline": head["vs_baseline"],
        "detail": {"configs": results,
                   "chain_iters": iters, "repeats": repeats,
                   "backend": backend,
                   "ckpt": os.path.basename(ckpt) if ckpt else None,
                   "device": str(jax.devices()[0])},
    }
    if skipped:
        out["detail"]["skipped_over_budget"] = skipped
    print(json.dumps(out))


if __name__ == "__main__":
    main()
