"""Gradient parity against the REFERENCE CUDA math (backward.cu:496-807),
not just our own oracle.

The oracle (ops/blend_oracle.py) shares our kernels' semantics, so the
existing parity suite cannot detect a deviation from the reference's
hand-derived gradients.  This file re-derives the reference forward
(forward.cu:305-600 `renderCUDA`, render_geo path) and backward
(backward.cu:496-807 `renderCUDA`) per pixel in plain numpy, then compares
`jax.grad` through our blend + median composition against it.

What the reference math actually is (established below, test by test):

1. For the color / normal / alpha-chain gradients the reference's
   suffix-accumulator trick is EXACT reverse-mode autodiff of its forward —
   test_color_normal_alpha_grads_match_reference asserts tight parity.
2. For the median-depth path the reference keeps only the DIRECT term
   dmedian/dw_j for buffered instances and drops the cross terms
   dw_k/dalpha_j = -w_k/(1-alpha_j) for later buffer entries k (there is no
   suffix accumulator for buffer weights in backward.cu:693-767).  Our
   autodiff keeps them.  test_median_grads_reference_plus_crossterms shows
   ref + explicit cross-term correction == ours, and bounds the raw gap.
3. Two deliberate deviations documented in ops/blend_pallas.py:
   a. alpha-clamp gating: the reference backprops dL_dG = op*dL_dalpha and
      dL_dop = G*dL_dalpha even where alpha = min(0.99, op*G) clamped
      (backward.cu:788-806 has no clamp guard); min()'s true derivative is
      zero there.  test_alpha_clamp_deviation confines and bounds it.
   b. median window smear: after the circular "before" buffer wraps, the
      reference window [low,high] (backward.cu:693) spans contributors that
      were OVERWRITTEN and are no longer in the buffer; they receive
      spurious median gradients.  Ours routes exactly to buffer occupants.
      test_median_window_smear_deviation confines and bounds it.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ibgs_tpu.ops import blend_common as bc
from ibgs_tpu.ops.blend_common import BlendConfig, Instances
from ibgs_tpu.ops.blend_oracle import blend_oracle

W, H = 16, 8          # one 8x16 tile
FX = FY = 20.0
CX, CY = W * 0.5, H * 0.5   # backward.cu:645-647 uses W/2, H/2
BUF = 8               # before_cap 4 / below_cap 4
EPS = 1.0e-8


class _Bins:
    def __init__(self, n):
        self.tile_start = jnp.zeros((1,), jnp.int32)
        self.tile_stop = jnp.full((1,), n, jnp.int32)


def _scene(seed, n, op_lo, op_hi, clamp_one=False):
    rng = np.random.default_rng(seed)
    inst = {
        "mean2d": np.stack([rng.uniform(1, W - 1, n),
                            rng.uniform(1, H - 1, n)], 1).astype(np.float32),
        "conic": np.stack([rng.uniform(0.02, 0.08, n),
                           rng.uniform(-0.01, 0.01, n),
                           rng.uniform(0.02, 0.08, n)], 1).astype(np.float32),
        "opacity": rng.uniform(op_lo, op_hi, n).astype(np.float32),
        "rgb": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        # near view-aligned planes: depth = -dist/(n.r) ~ dist > 0
        "normal": np.stack([rng.uniform(-0.05, 0.05, n),
                            rng.uniform(-0.05, 0.05, n),
                            np.full(n, -1.0)], 1).astype(np.float32),
        "dist": np.sort(rng.uniform(1.0, 3.0, n)).astype(np.float32),
    }
    if clamp_one:
        inst["opacity"][2] = 1.5   # alpha clamps at 0.99 near its centre
    cots = {
        "cotC": rng.normal(size=(H, W, 3)).astype(np.float32),
        "cotN": rng.normal(size=(H, W, 3)).astype(np.float32),
        "cotD": rng.normal(size=(H, W)).astype(np.float32),
        "bg": np.array([0.2, 0.3, 0.4], np.float32),
    }
    return inst, cots


# --------------------------------------------------------------------------
# numpy re-derivation of the reference kernels
# --------------------------------------------------------------------------

def ref_forward(inst, buffer_len=BUF):
    """forward.cu renderCUDA, render_geo=true, per-pixel python re-derivation.
    Returns per-pixel dicts needed by the backward."""
    n = inst["opacity"].shape[0]
    before_cap = (buffer_len + 1) // 2
    below_cap = buffer_len - before_cap
    out = {k: np.zeros((H, W) + s, np.float64) for k, s in
           [("color", (3,)), ("normal", (3,)), ("T", ()), ("median", ()),
            ("sum_w", ())]}
    ints = {k: np.zeros((H, W), np.int64) for k in ("last", "low", "high")}
    bufs = {k: np.zeros((H, W, buffer_len)) for k in ("bd", "bw")}
    bufs["bc"] = np.zeros((H, W, buffer_len), np.int64)
    for py in range(H):
        for px in range(W):
            rx, ry = (px - CX) / FX, (py - CY) / FY
            T, C, nrm = 1.0, np.zeros(3), np.zeros(3)
            bd = np.zeros(buffer_len)
            bw = np.zeros(buffer_len)
            bcn = np.zeros(buffer_len, np.int64)
            before_ptr = below = last = contributor = 0
            for j in range(n):
                contributor += 1
                dx = inst["mean2d"][j, 0] - px
                dy = inst["mean2d"][j, 1] - py
                c0, c1, c2 = inst["conic"][j]
                power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
                if power > 0.0:
                    continue
                alpha = min(0.99, inst["opacity"][j] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1.0 - alpha)
                if test_T < 1e-4:
                    break
                aT = alpha * T
                C += inst["rgb"][j] * aT
                nrm += inst["normal"][j] * aT
                nx, ny, nz = inst["normal"][j]
                depth_i = -inst["dist"][j] / (nx * rx + ny * ry + nz + EPS)
                if depth_i > 0.0:
                    if T > 0.5:
                        bd[before_ptr], bw[before_ptr] = depth_i, aT
                        bcn[before_ptr] = contributor
                        before_ptr = (before_ptr + 1) % before_cap
                    elif below < below_cap:
                        k = before_cap + below
                        bd[k], bw[k], bcn[k] = depth_i, aT, contributor
                        below += 1
                T, last = test_T, contributor
            # median + window cache (forward.cu:513-567, slot-0 seeding quirk)
            low = high = bcn[0]
            sum_w = wd = 0.0
            for i in range(buffer_len):
                if bw[i] != 0.0:
                    sum_w += bw[i]
                    wd += bw[i] * bd[i]
                    low, high = min(low, bcn[i]), max(high, bcn[i])
            out["color"][py, px] = C
            out["normal"][py, px] = nrm
            out["T"][py, px] = T
            out["median"][py, px] = wd / (sum_w + EPS)
            out["sum_w"][py, px] = sum_w
            ints["last"][py, px] = last
            ints["low"][py, px], ints["high"][py, px] = low, high
            bufs["bd"][py, px], bufs["bw"][py, px] = bd, bw
            bufs["bc"][py, px] = bcn
    return out, ints, bufs


def ref_backward(inst, fwd, cots, add_crossterms=False, buffer_len=BUF):
    """backward.cu:496-807 re-derivation (dL_dout_warped_images = 0; one
    valid source with identity ref_to_src and a CONSTANT source image, so
    the bilinear texture gradients of 2.2.2 vanish and only sections 2.1 +
    2.2.4 act on the median path).  Conic off-diagonal uses OUR full-factor
    convention (the reference stores half in dL_dconic2D.y and doubles it in
    its preprocess backward).  The viewport factors ddelx_dx=0.5W are
    omitted (our mean2d grads are in pixels).

    add_crossterms=True adds the dmedian/dw_k cross terms the reference
    drops (see module docstring), turning the re-derivation into the exact
    gradient of the reference forward."""
    out, ints, bufs = fwd
    n = inst["opacity"].shape[0]
    g = {"mean2d": np.zeros((n, 2)), "conic": np.zeros((n, 3)),
         "opacity": np.zeros(n), "rgb": np.zeros((n, 3)),
         "normal": np.zeros((n, 3)), "dist": np.zeros(n)}
    cotC, cotN, cotD, bg = (cots["cotC"], cots["cotN"], cots["cotD"],
                            cots["bg"])
    for py in range(H):
        for px in range(W):
            rx, ry = (px - CX) / FX, (py - CY) / FY
            T_final = out["T"][py, px]
            last = ints["last"][py, px]
            low, high = ints["low"][py, px], ints["high"][py, px]
            sum_w = out["sum_w"][py, px]
            median = out["median"][py, px]
            bd, bw = bufs["bd"][py, px], bufs["bw"][py, px]
            bcn = bufs["bc"][py, px]
            T = T_final
            accum_rec = np.zeros(3)
            last_color = np.zeros(3)
            accum_nrm = np.zeros(3)
            last_nrm = np.zeros(3)
            last_alpha = 0.0
            bg_dot = float(bg @ cotC[py, px])
            for j in range(n - 1, -1, -1):
                contributor = j            # 0-based, ids are depth order
                if contributor >= last:    # last is the 1-based count
                    continue
                dx = inst["mean2d"][j, 0] - px
                dy = inst["mean2d"][j, 1] - py
                c0, c1, c2 = inst["conic"][j]
                power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
                if power > 0.0:
                    continue
                G = np.exp(power)
                alpha = min(0.99, inst["opacity"][j] * G)
                if alpha < 1.0 / 255.0:
                    continue
                T = T / (1.0 - alpha)
                aT = alpha * T
                dL_dalpha = 0.0
                for ch in range(3):
                    c = inst["rgb"][j, ch]
                    accum_rec[ch] = (last_alpha * last_color[ch]
                                     + (1.0 - last_alpha) * accum_rec[ch])
                    last_color[ch] = c
                    dL_dalpha += (c - accum_rec[ch]) * cotC[py, px, ch]
                    g["rgb"][j, ch] += aT * cotC[py, px, ch]
                for ch in range(3):
                    c = inst["normal"][j, ch]
                    accum_nrm[ch] = (last_alpha * last_nrm[ch]
                                     + (1.0 - last_alpha) * accum_nrm[ch])
                    last_nrm[ch] = c
                    dL_dalpha += (c - accum_nrm[ch]) * cotN[py, px, ch]
                    g["normal"][j, ch] += aT * cotN[py, px, ch]
                # median window (backward.cu:693-767)
                if low - 1 <= contributor <= high - 1:
                    nx, ny, nz = inst["normal"][j]
                    tmp = nx * rx + ny * ry + nz + EPS
                    tmp2 = inst["dist"][j] / (tmp * tmp)
                    depth_i = -inst["dist"][j] / tmp
                    if depth_i > 0.0:
                        dmed_pg = cotD[py, px] * aT / sum_w
                        dL_dalpha += (cotD[py, px]
                                      * (depth_i - median) / sum_w)
                        g["dist"][j] += -dmed_pg / tmp
                        g["normal"][j, 0] += dmed_pg * tmp2 * rx
                        g["normal"][j, 1] += dmed_pg * tmp2 * ry
                        g["normal"][j, 2] += dmed_pg * tmp2
                dL_dalpha *= T
                if add_crossterms:
                    # dw_k/dalpha_j = -w_k/(1-alpha_j) for buffer entries
                    # AFTER j — the terms backward.cu drops
                    cross = 0.0
                    for k in range(buffer_len):
                        if bw[k] != 0.0 and bcn[k] - 1 > contributor:
                            cross += ((bd[k] - median) / (sum_w + EPS)
                                      * (-bw[k] / (1.0 - alpha)))
                    dL_dalpha += cotD[py, px] * cross
                last_alpha = alpha
                dL_dalpha += (-T_final / (1.0 - alpha)) * bg_dot
                dL_dG = inst["opacity"][j] * dL_dalpha
                gdx, gdy = G * dx, G * dy
                g["mean2d"][j, 0] += dL_dG * (-gdx * c0 - gdy * c1)
                g["mean2d"][j, 1] += dL_dG * (-gdy * c2 - gdx * c1)
                g["conic"][j, 0] += -0.5 * gdx * dx * dL_dG
                g["conic"][j, 1] += -gdx * dy * dL_dG
                g["conic"][j, 2] += -0.5 * gdy * dy * dL_dG
                g["opacity"][j] += G * dL_dalpha
    return g


# --------------------------------------------------------------------------
# our gradients: jax.grad through blend_oracle + median composition
# --------------------------------------------------------------------------

def our_grads(inst, cots):
    n = inst["opacity"].shape[0]
    cfg = BlendConfig(tile_h=H, tile_w=W, buffer_len=BUF, render_geo=True)
    bins = _Bins(n)
    cotC = jnp.asarray(cots["cotC"])
    cotN = jnp.asarray(cots["cotN"])
    cotD = jnp.asarray(cots["cotD"])
    bg = jnp.asarray(cots["bg"])

    def loss(fields):
        b = blend_oracle(Instances(**fields), bins, W, H, FX, FY, CX, CY,
                         cfg)
        render = b.color + b.final_t[..., None] * bg
        tot = b.buf_weight.sum(-1)
        median = (b.buf_weight * b.buf_depth).sum(-1) / (tot + EPS)
        return (jnp.sum(render * cotC) + jnp.sum(b.normal * cotN)
                + jnp.sum(median * cotD))

    fields = {k: jnp.asarray(v) for k, v in inst.items()}
    return jax.grad(loss)(fields)


def _cmp(ours, ref, rtol, atol, keys=None):
    for k in keys or ours.keys():
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref[k], rtol=rtol, atol=atol,
            err_msg=f"grad[{k}]")


def _max_gap(ours, ref):
    return {k: float(np.abs(np.asarray(ours[k]) - ref[k]).max())
            for k in ref}


def test_forward_rederivation_matches_oracle():
    """The numpy forward re-derivation of forward.cu reproduces our oracle's
    outputs exactly — anchors the backward comparison."""
    inst, _ = _scene(0, 12, 0.10, 0.18)
    fwd = ref_forward(inst)
    cfg = BlendConfig(tile_h=H, tile_w=W, buffer_len=BUF, render_geo=True)
    b = blend_oracle(Instances(**{k: jnp.asarray(v) for k, v in
                                  inst.items()}),
                     _Bins(12), W, H, FX, FY, CX, CY, cfg)
    np.testing.assert_allclose(np.asarray(b.color), fwd[0]["color"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.final_t), fwd[0]["T"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(b.buf_depth), fwd[2]["bd"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.buf_weight), fwd[2]["bw"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(b.n_contrib), fwd[1]["last"])


def test_color_normal_alpha_grads_match_reference():
    """cotD=0: every gradient the reference hand-derives for the color /
    normal / alpha chain matches our autodiff tightly (no clamp active, so
    the documented clamp deviation is out of play)."""
    inst, cots = _scene(1, 12, 0.10, 0.18)
    cots = dict(cots, cotD=np.zeros((H, W), np.float32))
    ref = ref_backward(inst, ref_forward(inst), cots)
    ours = our_grads(inst, cots)
    _cmp(ours, ref, rtol=2e-4, atol=2e-5)


def test_median_grads_reference_plus_crossterms():
    """cotD!=0, no buffer wrap: the raw reference math deviates from exact
    autodiff ONLY by the dropped dmedian/dw_k cross terms; adding them back
    gives tight parity.  The raw gap is reported and bounded."""
    inst, cots = _scene(2, 10, 0.10, 0.16)
    fwd = ref_forward(inst)
    # no-wrap guard: every pixel's window must equal its buffer occupancy
    assert (fwd[1]["high"] <= BUF + 4).all()
    ours = our_grads(inst, cots)
    exact = ref_backward(inst, fwd, cots, add_crossterms=True)
    _cmp(ours, exact, rtol=5e-4, atol=5e-5)
    raw = ref_backward(inst, fwd, cots, add_crossterms=False)
    gap = _max_gap(ours, raw)
    # color grads are untouched by the median path
    assert gap["rgb"] < 1e-5, gap
    # the dropped cross terms are small but real: O(w_k * cotD / sum_w);
    # bound the deviation so a future regression is caught
    assert 0 < max(gap["opacity"], gap["normal"]) < 0.5, gap


def test_alpha_clamp_deviation():
    """One splat clamped at alpha=0.99: the reference still backprops
    through op*G (no clamp guard, backward.cu:788-806); ours treats the
    clamp's derivative as zero.  The deviation is confined to the clamped
    splat's alpha-path grads (rgb/normal blend grads all still match)."""
    inst, cots = _scene(3, 8, 0.10, 0.16, clamp_one=True)
    cots = dict(cots, cotD=np.zeros((H, W), np.float32))
    ref = ref_backward(inst, ref_forward(inst), cots)
    ours = our_grads(inst, cots)
    _cmp(ours, ref, rtol=2e-4, atol=2e-5, keys=["rgb", "normal", "dist"])
    d_op = np.abs(np.asarray(ours["opacity"]) - ref["opacity"])
    d_m2 = np.abs(np.asarray(ours["mean2d"]) - ref["mean2d"]).max(1)
    others = [j for j in range(8) if j != 2]
    assert d_op[others].max() < 2e-4 and d_m2[others].max() < 2e-4
    # the clamped splat's own alpha-path deviates (reference leaks gradient
    # through the clamp); it must be the unique deviation site
    assert d_op[2] > 1e-3 or d_m2[2] > 1e-3, (d_op[2], d_m2[2])


def test_median_window_smear_deviation():
    """Circular-buffer wrap: the reference window [low,high] spans
    contributors that were overwritten out of the buffer and smears median
    gradients onto them (backward.cu:693); we route exactly to occupants.
    With cross terms added, any remaining ours-vs-ref gap is exactly that
    smear: confined to the median path of wrapped pixels, color grads
    intact."""
    inst, cots = _scene(4, 16, 0.04, 0.07)   # low alpha: many before-pushes
    fwd = ref_forward(inst)
    # ensure the wrap actually happened somewhere
    width = fwd[1]["high"] - fwd[1]["low"]
    assert (width >= BUF).any(), "scene failed to wrap the before buffer"
    ours = our_grads(inst, cots)
    ref_x = ref_backward(inst, fwd, cots, add_crossterms=True)
    gap = _max_gap(ours, ref_x)
    assert gap["rgb"] < 1e-5, gap
    # smear is real but bounded: each smeared instance receives at most
    # |cotD| * aT / sum_w extra median weight gradient
    assert 0 < max(gap["dist"], gap["normal"]) < 1.0, gap
