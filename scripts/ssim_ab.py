"""Hardware A/B for the stacked channel-leading SSIM blur (VERDICT r4 #7).

Times `losses.dssim_l1` fwd+bwd at 1080p with IBGS_SSIM_STACKED=0 vs 1 in
one process (the flag is read at import, so both variants are built from
the two code paths directly).  Chained-iteration methodology per
CLAUDE.md: trips inside one jit with a data dependency, scalar return.

Run: `python scripts/ssim_ab.py` (real TPU).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ibgs_tpu.train import losses

    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    b = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    iters, repeats = 20, 3

    def hwc_map(x, y):
        # the non-stacked ssim_map branch (losses.py), inlined so both
        # variants run in one process regardless of IBGS_SSIM_STACKED
        mu1, mu2 = losses._blur(x), losses._blur(y)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = losses._blur(x * x) - mu1_sq
        s2 = losses._blur(y * y) - mu2_sq
        s12 = losses._blur(x * y) - mu12
        return ((2 * mu12 + losses.C1) * (2 * s12 + losses.C2)) / (
            (mu1_sq + mu2_sq + losses.C1) * (s1 + s2 + losses.C2))

    def variant(stacked):
        def loss(x, y):
            if stacked:
                m = jnp.moveaxis(losses._ssim_map_chw(
                    jnp.moveaxis(x, -1, 0), jnp.moveaxis(y, -1, 0)), 0, -1)
            else:
                m = hwc_map(x, y)
            return (1.0 - m.mean()) + jnp.abs(x - y).mean()

        g = jax.grad(loss)

        def chain(x, y, k):
            def body(i, acc):
                eps = acc * 1e-30 + jnp.float32(i) * 1e-7
                gx = g(x + eps, y)
                return acc + jnp.sum(gx * gx)
            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        return jax.jit(chain)

    out = {}
    for name, stacked in (("hwc", False), ("stacked_chw", True)):
        step = variant(stacked)
        t0 = time.time()
        v = float(step(a, b, jnp.int32(iters)))
        cold = time.time() - t0
        assert np.isfinite(v)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(step(a, b, jnp.int32(iters)))
            best = min(best, time.time() - t0)
        out[name] = best / iters * 1e3
        print(f"{name}: {out[name]:.3f} ms/iter (fwd+bwd dssim_l1 1080p, "
              f"cold {cold:.1f}s)", flush=True)

    # parity: identical maps up to f32 noise
    m0 = hwc_map(a, b)
    m1 = jnp.moveaxis(losses._ssim_map_chw(
        jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)), 0, -1)
    err = float(jnp.abs(m0 - m1).max())
    print(f"parity max abs err: {err:.3e}", flush=True)
    print({"hwc_ms": round(out['hwc'], 3),
           "stacked_ms": round(out['stacked_chw'], 3),
           "winner": min(out, key=out.get)}, flush=True)


if __name__ == "__main__":
    main()
