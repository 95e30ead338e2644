"""1080p warp-gather layout A/B (VERDICT r3 #2).

The epilogue's bilinear warp gathers one 16-byte row per (buffer entry,
pixel) from a (Hs*Ws, 4) int32 2x2-footprint table; at 1080p that table is
33.4 MB/view, falls out of cache, and the per-row cost rises 4.3 -> 6.05 ns
(47% of the step).  This probe measures the candidate layouts on REAL
hardware with epilogue-shaped semi-coherent indices:

  base  : 1 gather/row from the (HW,4) footprint table   (33.4 MB @1080p)
  pair  : 2 gathers/row ([texel|right] rows y0, y0+1)     (16.7 MB)
  texel : 4 gathers/row from the plain texel table        ( 8.4 MB)
  bandK : K masked passes over row-band tables            (33.4/K MB each)

Each variant computes the full bilinear corner mix (so XLA fusion effects
are included) and returns a scalar; timing per CLAUDE.md (chained
fori_loop, min over repeats).  Prints one JSON line per variant.

    python scripts/warp_probe.py            # 1080p shapes
    PROBE_W=960 PROBE_H=544 python scripts/warp_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

W = int(os.environ.get("PROBE_W", 1920))
H = int(os.environ.get("PROBE_H", 1088))
B = int(os.environ.get("PROBE_B", 4))
ITERS = int(os.environ.get("PROBE_ITERS", 8))
REPEATS = int(os.environ.get("PROBE_REPEATS", 3))
BANDS = [int(x) for x in os.environ.get("PROBE_BANDS", "2,4").split(",")]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, label, *args):
    """Chained fori_loop timing; returns (compile_s, ms/iter)."""
    def run(n, *a):
        def body(i, acc):
            return acc + fn(i, *a)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    fit = jax.jit(run, static_argnums=0)
    t0 = time.time()
    jax.block_until_ready(fit(1, *args))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(REPEATS):
        t1 = time.time()
        jax.block_until_ready(fit(1, *args))
        t_one = time.time() - t1
        t1 = time.time()
        jax.block_until_ready(fit(ITERS, *args))
        t_n = time.time() - t1
        best = min(best, (t_n - t_one) / (ITERS - 1))
    return compile_s, best * 1e3


def main():
    rng = np.random.default_rng(0)
    HW = H * W
    n_rows = B * HW

    # epilogue-shaped indices: per buffer entry, the projected source pixel
    # wanders smoothly around the target pixel (depth-dependent shift) —
    # B-major sweeps over a semi-coherent field, fractional u/v.
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    u = np.empty((B, H, W), np.float32)
    v = np.empty((B, H, W), np.float32)
    for b in range(B):
        du = rng.normal(0, 30) + 8 * np.sin(ys / 37.0 + b) \
            + rng.normal(0, 1.5, (H, W))
        dv = rng.normal(0, 30) + 8 * np.cos(xs / 53.0 - b) \
            + rng.normal(0, 1.5, (H, W))
        u[b] = np.clip(xs + du, 0, W - 2)
        v[b] = np.clip(ys + dv, 0, H - 2)
    uf = jnp.asarray(u.reshape(-1))
    vf = jnp.asarray(v.reshape(-1))
    x0 = jnp.floor(uf).astype(jnp.int32)
    y0 = jnp.floor(vf).astype(jnp.int32)
    fu = uf - jnp.floor(uf)
    fv = vf - jnp.floor(vf)
    idx = y0 * W + x0                                   # (BHW,)
    w00, w01 = (1 - fu) * (1 - fv), fu * (1 - fv)
    w10, w11 = (1 - fu) * fv, fu * fv

    texel = jnp.asarray(rng.integers(0, 1 << 30, (HW,), dtype=np.int32))
    right = jnp.roll(texel, -1)
    down = jnp.roll(texel, -W)
    downright = jnp.roll(right, -W)
    tab4 = jnp.stack([texel, right, down, downright], -1)   # (HW,4) 16B rows
    tab2 = jnp.stack([texel, right], -1)                    # (HW,2)  8B rows

    def unpack(q):
        s = 1.0 / 1023.0
        return (((q >> 20) & 1023).astype(jnp.float32) * s,
                ((q >> 10) & 1023).astype(jnp.float32) * s,
                (q & 1023).astype(jnp.float32) * s)

    def mix_rows(c00, c01, c10, c11):
        """Per-row bilinear mix summed over the 3 channels → (BHW,)."""
        out = jnp.zeros_like(w00)
        for ch in range(3):
            out += (w00 * unpack(c00)[ch] + w01 * unpack(c01)[ch]
                    + w10 * unpack(c10)[ch] + w11 * unpack(c11)[ch])
        return out

    def mix(c00, c01, c10, c11):
        return mix_rows(c00, c01, c10, c11).sum()

    def base(i, tab4, idx):
        rows = tab4[(idx + i) % HW]                        # (BHW,4)
        return mix(rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3])

    def pair(i, tab2, idx):
        r0 = tab2[(idx + i) % HW]                          # (BHW,2)
        r1 = tab2[(idx + i + W) % HW]
        return mix(r0[:, 0], r0[:, 1], r1[:, 0], r1[:, 1])

    def texel4(i, texel, idx):
        i00 = (idx + i) % HW
        return mix(texel[i00], texel[(i00 + 1) % HW],
                   texel[(i00 + W) % HW], texel[(i00 + W + 1) % HW])

    variants = [("base_16B_row", base, (tab4, idx)),
                ("pair_2x8B_rows", pair, (tab2, idx)),
                ("texel_4x4B_rows", texel4, (texel, idx))]

    for nb in BANDS:
        rows_band = H // nb

        def bandk(i, tab4, idx, y0, nb=nb, rows_band=rows_band):
            acc = jnp.float32(0.0)
            ii = (idx + i) % HW
            for b in range(nb):
                lo = b * rows_band
                inb = (y0 >= lo) & (y0 < lo + rows_band)
                loc = jnp.where(inb, ii - lo * W, 0)
                sub = lax.dynamic_slice_in_dim(tab4, lo * W, rows_band * W)
                rows = sub[loc]
                m = inb.astype(jnp.float32)
                acc += (m * mix_rows(rows[:, 0], rows[:, 1],
                                     rows[:, 2], rows[:, 3])).sum()
            return acc

        variants.append((f"band{nb}_masked", bandk, (tab4, idx, y0)))

    emit(probe="warp_layout", W=W, H=H, B=B, rows=n_rows,
         table_mb=round(HW * 16 / 1e6, 1))
    for name, fn, args in variants:
        compile_s, ms = timed(fn, name, *args)
        emit(variant=name, ms=round(ms, 3),
             ns_per_row=round(ms * 1e6 / n_rows, 3),
             compile_s=round(compile_s, 1))


if __name__ == "__main__":
    main()
