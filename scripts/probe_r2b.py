"""Round-2 follow-up probes: pack_rows backward variants + SSIM layout.

Findings being tested (from the hlo_stats trace of bench.py @ 267 ms/step):
  * sort.486 (22.9 ms): XLA CSE-merges the four 5-operand slot sorts into
    one 17-operand sort — is the merge a win or a loss vs forced-separate
    sorts (optimization_barrier on the key)?
  * fusion.667 (22.6 ms): the (cap+1, 16) cumsum table is column-major
    ({0,1} — XLA's choice for stacked 1-D sort outputs), so the (P+1)-row
    boundary gather pays 16 strided reads per row.  Does forcing the
    table row-major (tiny MXU dot against a 16x16 permutation matrix)
    make the gather ~sequential?
  * SSIM blur family (~19 ms of reshape/bitcast): does a planar (3, H, W)
    formulation avoid the layout churn of (H, W, 3)?

Run on the TPU: `python scripts/probe_r2b.py`
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

CAP = int(os.environ.get("PROBE_CAP", 1 << 21))
P = int(os.environ.get("PROBE_P", 524288))
C = 16
ITERS = 5


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def timed_loop(body, carry0, label, iters=ITERS, args=()):
    def run(n, carry, *a):
        return lax.fori_loop(0, n, lambda i, c: body(c, *a), carry)

    fit = jax.jit(run)
    t0 = time.time()
    jax.block_until_ready(fit(jnp.int32(1), carry0, *args))
    compile_s = time.time() - t0
    jax.block_until_ready(fit(jnp.int32(1), carry0, *args))
    t1 = time.time()
    jax.block_until_ready(fit(jnp.int32(1), carry0, *args))
    t_one = time.time() - t1
    t1 = time.time()
    jax.block_until_ready(fit(jnp.int32(iters), carry0, *args))
    t_n = time.time() - t1
    ms = (t_n - t_one) / (iters - 1) * 1e3
    emit(label, compile_s=round(compile_s, 1), ms=round(ms, 2))
    return ms


def make_bins():
    """Synthetic but realistic slot/seg_off: each of P gaussians owns a
    contiguous slot range; ~25% of cap used like the bench scene."""
    rng = np.random.default_rng(0)
    cnt = rng.integers(0, 6, P).astype(np.int64)
    total = int(cnt.sum())
    assert total < CAP
    off = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
    slot = np.full(CAP, CAP, np.int32)
    # tile-sorted order ~ a pseudo-random permutation of the valid slots
    perm = rng.permutation(total).astype(np.int32)
    slot[:total] = perm
    g = rng.random((CAP, C)).astype(np.float32)
    order = rng.permutation(P).astype(np.int32)
    return (jnp.asarray(slot), jnp.asarray(off), jnp.asarray(g),
            jnp.asarray(order), total)


def pack_bwd_variants():
    slot, seg_off, g0, order, total = make_bins()

    def tail(cums, seg_off, order):
        cb = cums[jnp.clip(seg_off, 0, CAP)]
        g_ranked = cb[1:] - cb[:-1]
        rinv = lax.sort((order, jnp.arange(P, dtype=jnp.int32)),
                        num_keys=1)[1]
        return g_ranked[rinv]

    def var_current(c, slot, seg_off, g, order):
        g = g + c * 1e-30
        cols = []
        for k in range(0, C, 4):
            pay = tuple(g[:, k + j] for j in range(4))
            cols.extend(lax.sort((slot,) + pay, num_keys=1)[1:])
        g_pre = jnp.stack(cols, axis=1)
        cums = jnp.cumsum(g_pre, axis=0)
        cums = jnp.concatenate([jnp.zeros((1, C), g.dtype), cums], axis=0)
        return jnp.sum(tail(cums, seg_off, order)) * 1e-30

    def var_barrier(c, slot, seg_off, g, order):
        """optimization_barrier per sort key → XLA cannot CSE-merge."""
        g = g + c * 1e-30
        cols = []
        for k in range(0, C, 4):
            key = lax.optimization_barrier(slot)
            pay = tuple(g[:, k + j] for j in range(4))
            cols.extend(lax.sort((key,) + pay, num_keys=1)[1:])
        g_pre = jnp.stack(cols, axis=1)
        cums = jnp.cumsum(g_pre, axis=0)
        cums = jnp.concatenate([jnp.zeros((1, C), g.dtype), cums], axis=0)
        return jnp.sum(tail(cums, seg_off, order)) * 1e-30

    # 16x16 reversal permutation — NOT foldable by XLA, forces a real MXU
    # dot whose output is row-major; gather then reads contiguous rows.
    PM = jnp.asarray(np.eye(C, dtype=np.float32)[::-1])

    def var_rowmajor(c, slot, seg_off, g, order):
        g = g + c * 1e-30
        cols = []
        for k in range(0, C, 4):
            pay = tuple(g[:, k + j] for j in range(4))
            cols.extend(lax.sort((slot,) + pay, num_keys=1)[1:])
        g_pre = jnp.stack(cols, axis=1)
        cums = jnp.cumsum(g_pre, axis=0)
        cums = jnp.concatenate([jnp.zeros((1, C), g.dtype), cums], axis=0)
        cums = jnp.dot(cums, PM, precision=lax.Precision.DEFAULT)
        out = tail(cums, seg_off, order)
        return jnp.sum(out[:, ::-1]) * 1e-30

    def var_rowmajor_prod(c, slot, seg_off, g, order):
        """row-major via dot BEFORE the cumsum (cumsum then row-major too)"""
        g = g + c * 1e-30
        cols = []
        for k in range(0, C, 4):
            pay = tuple(g[:, k + j] for j in range(4))
            cols.extend(lax.sort((slot,) + pay, num_keys=1)[1:])
        g_pre = jnp.dot(jnp.stack(cols, axis=1), PM,
                        precision=lax.Precision.DEFAULT)
        cums = jnp.cumsum(g_pre, axis=0)
        cums = jnp.concatenate([jnp.zeros((1, C), g.dtype), cums], axis=0)
        out = tail(cums, seg_off, order)
        return jnp.sum(out[:, ::-1]) * 1e-30

    args = (slot, seg_off, g0, order)
    timed_loop(var_current, jnp.float32(0), "packbwd_current", args=args)
    timed_loop(var_barrier, jnp.float32(0), "packbwd_barrier", args=args)
    timed_loop(var_rowmajor, jnp.float32(0), "packbwd_rowmajor_dot", args=args)
    timed_loop(var_rowmajor_prod, jnp.float32(0), "packbwd_rowmajor_pre",
               args=args)

    # numeric agreement check (n=1 runs)
    def once(fn):
        return jax.jit(lambda *a: fn(jnp.float32(1.0), *a) * 1e30)(*args)

    a = once(var_current)
    for nm, fn in [("barrier", var_barrier), ("rowmajor", var_rowmajor),
                   ("rowmajor_pre", var_rowmajor_prod)]:
        b = once(fn)
        emit(f"packbwd_check_{nm}",
             rel=float(abs(a - b) / (abs(a) + 1e-12)))


def ssim_variants():
    from ibgs_tpu.train import losses
    H, W = 544, 960
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.random((H, W, 3)), jnp.float32)

    def var_hwc(c, a, b):
        val, g = jax.value_and_grad(
            lambda x: losses.ssim(x, b))(a + c * 1e-30)
        return val * 1e-30 + jnp.sum(g) * 1e-30

    w = losses._gauss_window(11, 1.5)

    def blur_planar(x):                      # x: (3, H, W)
        pad = 5

        def along(x, axis):
            padw = [(0, 0)] * 3
            padw[axis] = (pad, pad)
            xp = jnp.pad(x, padw)
            n = x.shape[axis]
            acc = None
            for k in range(11):
                t = lax.slice_in_dim(xp, k, k + n, axis=axis) * w[k]
                acc = t if acc is None else acc + t
            return acc

        return along(along(x, 1), 2)

    C1, C2 = 0.01 ** 2, 0.03 ** 2

    def ssim_planar(a, b):                   # (3,H,W)
        mu1, mu2 = blur_planar(a), blur_planar(b)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = blur_planar(a * a) - mu1_sq
        s2 = blur_planar(b * b) - mu2_sq
        s12 = blur_planar(a * b) - mu12
        return (((2 * mu12 + C1) * (2 * s12 + C2)) /
                ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))).mean()

    p1 = jnp.asarray(np.moveaxis(np.asarray(img1), -1, 0))
    p2 = jnp.asarray(np.moveaxis(np.asarray(img2), -1, 0))

    def var_planar(c, a, b):
        val, g = jax.value_and_grad(
            lambda x: ssim_planar(x, b))(a + c * 1e-30)
        return val * 1e-30 + jnp.sum(g) * 1e-30

    def var_hwc_in_planar_out(c, a, b):
        """planar compute on HWC inputs (transpose inside)"""
        def f(x):
            return ssim_planar(jnp.moveaxis(x, -1, 0), jnp.moveaxis(b, -1, 0))
        val, g = jax.value_and_grad(f)(a + c * 1e-30)
        return val * 1e-30 + jnp.sum(g) * 1e-30

    timed_loop(var_hwc, jnp.float32(0), "ssim_hwc_fwdbwd", args=(img1, img2))
    timed_loop(var_planar, jnp.float32(0), "ssim_planar_fwdbwd",
               args=(p1, p2))
    timed_loop(var_hwc_in_planar_out, jnp.float32(0),
               "ssim_hwc_transpose_planar", args=(img1, img2))
    v1 = jax.jit(lambda: losses.ssim(img1, img2))()
    v2 = jax.jit(lambda: ssim_planar(p1, p2))()
    emit("ssim_check", rel=float(abs(v1 - v2) / abs(v1)))


def main():
    emit("device", dev=str(jax.devices()[0]))
    which = os.environ.get("PROBE_ONLY", "all")
    if which in ("all", "packbwd"):
        pack_bwd_variants()
    if which in ("all", "ssim"):
        ssim_variants()
    emit("done")


if __name__ == "__main__":
    main()

# RESULTS (v5e, 2026-08-18): the fori_loop chaining in timed_loop was
# hoisted for the packbwd variants whose result feeds back only through a
# 1e-30-scaled scalar (negative deltas) — timings unusable except:
#   packbwd_rowmajor_dot  41.0 ms   packbwd_rowmajor_pre 40.7 ms
# i.e. forcing the cumsum table row-major through a 16x16 MXU dot is ~2x
# WORSE than the column-major gather it replaces (22.6 ms in the bench
# trace).  Compile times: each variant 190-300 s (the 5-operand sorts
# CSE-merge into one 17-operand sort regardless of optimization_barrier).
# SSIM layouts are equivalent (0.60-0.67 ms fwd+bwd) — the unrolled
# shift-add blur is layout-insensitive.  Attribute step time with
# scripts/parse_trace.py instead of ad hoc chains (CLAUDE.md).
