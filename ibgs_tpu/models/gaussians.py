"""Gaussian scene model: parameters, optimiser, and adaptive density control.

TPU-first state design: all arrays have a static capacity `P` and an
`alive` mask — growth/shrink (clone / split / prune) is pure array surgery
(rank-based slot allocation + masked scatters) inside `jit`, replacing the
reference's dynamic tensor concatenation + torch-optimizer state rewriting
(/root/reference/scene/gaussian_model.py:362-515).  Capacity is only
resized (recompile) when occupancy crosses a threshold.

Behavioural parity notes vs the reference:
  * learnable fields: xyz, SH (dc + rest), log-scales, quaternion, opacity
    logit, plus the IBGS plane fields `normal` and `offset`
    (gaussian_model.py:57-76, 215-216);
  * per-group Adam (eps 1e-15) with exponential xyz / offset LR decay
    (training_setup :218-247);
  * clone: resample position inside the Gaussian for small, high-gradient
    splats; split: two children at 1/1.6 scale, parent replaced; the
    absolute-gradient split path is gated on screen radius and has its own
    budget (AbsGS-style, densify_and_split :465-515);
  * the reference's max_all_points quantile back-off becomes rank-based
    slot allocation: when free slots run short, the highest-gradient
    candidates win — same intent, deterministic on TPU;
  * opacity reset/decay rebuild the Adam moments of the opacity group
    (reset_opacity :302-310 + replace_tensor_to_optimizer).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from ibgs_tpu.core import sh as shlib
from ibgs_tpu.core import transforms as tf
from ibgs_tpu.core.knn import initial_log_scales


@struct.dataclass
class GaussianParams:
    xyz: jnp.ndarray            # (P, 3)
    sh_dc: jnp.ndarray          # (P, 1, 3)
    sh_rest: jnp.ndarray        # (P, K-1, 3)
    log_scale: jnp.ndarray      # (P, 3)
    quat: jnp.ndarray           # (P, 4) unnormalised
    opacity_logit: jnp.ndarray  # (P, 1)
    normal: jnp.ndarray         # (P, 3) learnable plane normal
    offset: jnp.ndarray         # (P, 1) learnable plane offset


@struct.dataclass
class GaussianModel:
    params: GaussianParams
    mu: GaussianParams          # Adam first moments
    nu: GaussianParams          # Adam second moments
    step: jnp.ndarray           # () int32 optimiser step
    alive: jnp.ndarray          # (P,) bool
    max_radii2d: jnp.ndarray    # (P,) float32
    grad_accum: jnp.ndarray     # (P,)
    grad_accum_abs: jnp.ndarray  # (P,)
    denom: jnp.ndarray          # (P,)
    denom_abs: jnp.ndarray      # (P,)
    active_sh_degree: jnp.ndarray  # () int32
    max_sh_degree: int = struct.field(pytree_node=False)

    # ---- activations -----------------------------------------------------
    @property
    def scale(self) -> jnp.ndarray:
        return jnp.exp(self.params.log_scale)

    @property
    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.params.opacity_logit[:, 0])

    @property
    def quat_unit(self) -> jnp.ndarray:
        # eps keeps dead (zero-padded) slots NaN-free; alive quats are
        # O(1)-norm so the perturbation is ~1e-12.
        return tf.normalize(self.params.quat, eps=1e-12)

    @property
    def sh_coeffs(self) -> jnp.ndarray:
        return jnp.concatenate([self.params.sh_dc, self.params.sh_rest], axis=1)

    @property
    def n_alive(self) -> jnp.ndarray:
        return self.alive.sum()

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]

    def smallest_axis(self) -> jnp.ndarray:
        """Principal axis with the smallest scale (gaussian_model.py:149-155)."""
        R = tf.quat_to_rotmat(self.quat_unit)
        idx = jnp.argmin(self.params.log_scale, axis=-1)
        return jnp.take_along_axis(
            R, idx[:, None, None].repeat(3, 1), axis=2)[..., 0]

    def oriented_normal(self, cam_pos, learnt: bool = True):
        """Camera-facing plane normal (+ signed offset) —
        gaussian_model.py:156-173."""
        if learnt:
            n = tf.normalize(self.params.normal, eps=1e-12)
            off = self.params.offset[:, 0]
        else:
            n = self.smallest_axis()
            off = jnp.zeros_like(self.params.offset[:, 0])
        to_cam = cam_pos - self.params.xyz
        flip = jnp.where((n * to_cam).sum(-1) < 0.0, -1.0, 1.0)
        return n * flip[:, None], off * flip


# --------------------------------------------------------------------------
# construction
# --------------------------------------------------------------------------

def _grow(x, cap):
    pad = [(0, cap - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def init_from_points(points: np.ndarray, colors: np.ndarray,
                     max_sh_degree: int = 2,
                     capacity: Optional[int] = None) -> GaussianModel:
    """Reference create_from_pcd (gaussian_model.py:185-216) with a static
    capacity (default: 4x the seed points, rounded up)."""
    n = points.shape[0]
    if capacity is None:
        capacity = max(4096, 1 << int(np.ceil(np.log2(4 * n))))
    pts = jnp.asarray(points, jnp.float32)
    K = shlib.num_coeffs(max_sh_degree)

    if n > 200_000:
        # Reference-scale seeds (1M+): the exact device 3-NN is O(N^2)
        # MXU flops with a (block, N)-sized f32 intermediate (4 GB at
        # N=1M) — use the native Morton/box-culled host KNN instead
        # (native/ibgs_native.cpp, the simple_knn.cu analog; seconds at
        # 1M points, exact).
        from ibgs_tpu.utils import native as _native
        d2 = np.clip(_native.knn_mean_sq_dist_3(np.asarray(points)),
                     1e-7, None)
        log_scales = jnp.asarray(
            np.repeat(np.log(np.sqrt(d2))[:, None], 3, axis=1), jnp.float32)
    else:
        log_scales = initial_log_scales(pts)

    params = GaussianParams(
        xyz=_grow(pts, capacity),
        sh_dc=_grow(shlib.rgb_to_sh0(jnp.asarray(colors, jnp.float32))[:, None, :],
                    capacity),
        sh_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
        log_scale=_grow(log_scales, capacity),
        quat=_grow(jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
                   capacity),
        opacity_logit=_grow(
            jnp.full((n, 1), float(np.log(0.1 / 0.9)), jnp.float32), capacity),
        normal=_grow(jnp.tile(jnp.array([[0.0, 0, 1.0]], jnp.float32), (n, 1)),
                     capacity),
        offset=jnp.zeros((capacity, 1), jnp.float32),
    )
    zerosP = jnp.zeros((capacity,), jnp.float32)
    return GaussianModel(
        params=params,
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        step=jnp.int32(0),
        alive=jnp.arange(capacity) < n,
        max_radii2d=zerosP,
        grad_accum=zerosP,
        grad_accum_abs=zerosP,
        denom=zerosP,
        denom_abs=zerosP,
        active_sh_degree=jnp.int32(0),
        max_sh_degree=max_sh_degree,
    )


def grow_capacity(model: GaussianModel, new_capacity: int) -> GaussianModel:
    """Host-side capacity bump (triggers one recompilation of the step)."""
    g = lambda x: _grow(x, new_capacity) if x.ndim >= 1 and \
        x.shape[0] == model.capacity else x
    return GaussianModel(
        params=jax.tree.map(g, model.params),
        mu=jax.tree.map(g, model.mu),
        nu=jax.tree.map(g, model.nu),
        step=model.step,
        alive=_grow(model.alive, new_capacity),
        max_radii2d=g(model.max_radii2d),
        grad_accum=g(model.grad_accum),
        grad_accum_abs=g(model.grad_accum_abs),
        denom=g(model.denom),
        denom_abs=g(model.denom_abs),
        active_sh_degree=model.active_sh_degree,
        max_sh_degree=model.max_sh_degree,
    )


# --------------------------------------------------------------------------
# optimiser (per-group Adam, eps 1e-15 — training_setup :218-247)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LRConfig:
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.025
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    normal_lr: float = 1e-3


def expon_lr(step, lr_init, lr_final, max_steps, delay_mult=0.01,
             delay_steps=0):
    """Log-linear LR interpolation (reference general_utils.py:33-65)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if delay_steps > 0:
        delay = delay_mult + (1 - delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / delay_steps, 0, 1))
    else:
        delay = 1.0
    return delay * log_lerp


def lr_tree(cfg: LRConfig, step, spatial_lr_scale) -> GaussianParams:
    """Per-group learning rates at `step` (matches update_learning_rate_offset
    + training_setup group LRs)."""
    xyz_lr = expon_lr(step, cfg.position_lr_init * spatial_lr_scale,
                      cfg.position_lr_final * spatial_lr_scale,
                      cfg.position_lr_max_steps, cfg.position_lr_delay_mult)
    off_lr = expon_lr(step, cfg.position_lr_init * spatial_lr_scale * 0.5,
                      cfg.position_lr_final * spatial_lr_scale * 0.5,
                      cfg.position_lr_max_steps, cfg.position_lr_delay_mult)
    return GaussianParams(
        xyz=xyz_lr,
        sh_dc=cfg.feature_lr,
        sh_rest=cfg.feature_lr / 20.0,
        log_scale=cfg.scaling_lr,
        quat=cfg.rotation_lr,
        opacity_logit=cfg.opacity_lr,
        normal=cfg.normal_lr,
        offset=off_lr,
    )


def adam_step(model: GaussianModel, grads: GaussianParams,
              lrs: GaussianParams, b1=0.9, b2=0.999,
              eps=1e-15) -> GaussianModel:
    step = model.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)
    # The loss is exactly independent of dead slots (alive-mask culling), but
    # their reverse-mode grads can be 0·nan — zero them before the update.
    grads = jax.tree.map(
        lambda g: jnp.where(
            model.alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0), grads)

    def upd(p, m, v, g, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        return p, m, v

    out = jax.tree.map(upd, model.params, model.mu, model.nu, grads, lrs)
    params = jax.tree.map(lambda t: t[0], out,
                          is_leaf=lambda t: isinstance(t, tuple))
    mu = jax.tree.map(lambda t: t[1], out,
                      is_leaf=lambda t: isinstance(t, tuple))
    nu = jax.tree.map(lambda t: t[2], out,
                      is_leaf=lambda t: isinstance(t, tuple))
    return model.replace(params=params, mu=mu, nu=nu, step=step)


# --------------------------------------------------------------------------
# densification statistics (train.py:400-410 + add_densification_stats)
# --------------------------------------------------------------------------

def accumulate_stats(model: GaussianModel, screen_grad, screen_grad_abs,
                     radii, width, height) -> GaussianModel:
    """screen_grad[_abs]: (P, 2) pixel-unit view-space gradients from the
    rasterizer's dummy inputs.  The reference accumulates NDC-convention
    norms (pixel grads x 0.5·W/H); we rescale to match its thresholds."""
    vis = radii > 0
    sgrad = screen_grad * jnp.array([0.5 * width, 0.5 * height])
    sabs = screen_grad_abs * jnp.array([0.5 * width, 0.5 * height])
    return model.replace(
        max_radii2d=jnp.where(vis, jnp.maximum(model.max_radii2d,
                                               radii.astype(jnp.float32)),
                              model.max_radii2d),
        grad_accum=model.grad_accum + jnp.where(
            vis, jnp.linalg.norm(sgrad, axis=-1), 0.0),
        grad_accum_abs=model.grad_accum_abs + jnp.where(
            vis, jnp.linalg.norm(sabs, axis=-1), 0.0),
        denom=model.denom + vis.astype(jnp.float32),
        denom_abs=model.denom_abs + vis.astype(jnp.float32),
    )


# --------------------------------------------------------------------------
# densify / prune
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2e-4
    abs_grad_threshold: float = 8e-4
    opacity_cull: float = 0.05
    percent_dense: float = 0.001
    abs_split_radii2d_threshold: float = 20.0
    max_abs_split: int = 50_000
    split_scale_shrink: float = 1.6    # children at scale / (0.8·N), N=2


def _allocate_slots(alive, want, priority):
    """Rank-based dead-slot allocation.  Returns (target_idx, granted)."""
    P = alive.shape[0]
    dead_order = jnp.argsort(alive, stable=True)     # dead slots first
    n_free = P - alive.sum()
    pr = jnp.where(want, priority, -jnp.inf)
    order = jnp.argsort(-pr, stable=True)
    rank = jnp.zeros((P,), jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    granted = want & (rank < n_free)
    target = dead_order[jnp.clip(rank, 0, P - 1)]
    return target, granted


def _scatter_from(model: GaussianModel, src_params: GaussianParams,
                  target, granted) -> GaussianModel:
    """Copy candidate rows into their granted slots; zero moments there."""
    P = model.capacity
    idx = jnp.where(granted, target, P)   # OOB = dropped

    def put(dst, src):
        return dst.at[idx].set(src, mode="drop")

    params = jax.tree.map(put, model.params, src_params)
    mu = jax.tree.map(lambda m: m.at[idx].set(0.0, mode="drop"), model.mu)
    nu = jax.tree.map(lambda m: m.at[idx].set(0.0, mode="drop"), model.nu)
    alive = model.alive.at[idx].set(True, mode="drop")
    return model.replace(params=params, mu=mu, nu=nu, alive=alive)


def self_scale(model: GaussianModel) -> jnp.ndarray:
    return jnp.exp(model.params.log_scale)


def _sampled_positions(model: GaussianModel, key) -> jnp.ndarray:
    """Sample positions inside each Gaussian (mean + R·N(0, S))."""
    eps = jax.random.normal(key, model.params.xyz.shape)
    R = tf.quat_to_rotmat(model.quat_unit)
    return model.params.xyz + jnp.einsum("pij,pj->pi", R, eps * self_scale(model))


def densify_and_prune(model: GaussianModel, key, cfg: DensifyConfig,
                      scene_extent, max_screen_size=None) -> GaussianModel:
    """clone → split → prune (reference densify_and_prune :580-597)."""
    g = model.grad_accum / jnp.maximum(model.denom, 1.0)
    g_abs = model.grad_accum_abs / jnp.maximum(model.denom_abs, 1.0)
    g = jnp.where(model.alive, jnp.nan_to_num(g), 0.0)
    g_abs = jnp.where(model.alive, jnp.nan_to_num(g_abs), 0.0)
    max_scale = self_scale(model).max(-1)
    small = max_scale <= cfg.percent_dense * scene_extent
    k1, k2, k3 = jax.random.split(key, 3)

    # --- clone: small splats, high gradient → sampled copy ---------------
    want_clone = model.alive & (g >= cfg.grad_threshold) & small
    clone_src = model.params.replace(xyz=_sampled_positions(model, k1))
    tgt, got = _allocate_slots(model.alive, want_clone, g)
    model = _scatter_from(model, clone_src, tgt, got)

    # --- split: large splats, high (or abs-high) gradient ----------------
    big = ~small & model.alive
    want_split = big & (g >= cfg.grad_threshold)
    abs_ok = (big & (~want_split)
              & (model.max_radii2d > cfg.abs_split_radii2d_threshold)
              & (g_abs >= cfg.abs_grad_threshold))
    # budget the abs-split path separately (max_abs_split_points)
    abs_pr = jnp.where(abs_ok, g_abs, -jnp.inf)
    abs_rank = jnp.zeros((model.capacity,), jnp.int32).at[
        jnp.argsort(-abs_pr, stable=True)].set(
        jnp.arange(model.capacity, dtype=jnp.int32))
    abs_ok = abs_ok & (abs_rank < cfg.max_abs_split)
    want_split = want_split | abs_ok

    shrink = float(np.log(cfg.split_scale_shrink))
    childA = model.params.replace(
        xyz=_sampled_positions(model, k2),
        log_scale=model.params.log_scale - shrink,
    )
    childB = model.params.replace(
        xyz=_sampled_positions(model, k3),
        log_scale=model.params.log_scale - shrink,
    )
    # child B into freshly allocated slots
    tgt, got = _allocate_slots(model.alive, want_split,
                               jnp.maximum(g, g_abs))
    model = _scatter_from(model, childB, tgt, got)
    # child A replaces the parent in place (only where B got a slot, so a
    # failed allocation leaves the parent untouched)
    repl = got

    def inplace(dst, src):
        return jnp.where(
            repl.reshape((-1,) + (1,) * (dst.ndim - 1)), src, dst)

    model = model.replace(
        params=jax.tree.map(inplace, model.params, childA),
        mu=jax.tree.map(lambda m: jnp.where(
            repl.reshape((-1,) + (1,) * (m.ndim - 1)), 0.0, m), model.mu),
        nu=jax.tree.map(lambda m: jnp.where(
            repl.reshape((-1,) + (1,) * (m.ndim - 1)), 0.0, m), model.nu),
    )

    # --- prune ------------------------------------------------------------
    prune = model.opacity < cfg.opacity_cull
    if max_screen_size is not None:
        prune = prune | (model.max_radii2d > max_screen_size)
        prune = prune | (self_scale(model).max(-1) > 0.1 * scene_extent)
    alive = model.alive & ~prune

    zeros = jnp.zeros_like(model.grad_accum)
    return model.replace(
        alive=alive,
        grad_accum=zeros, grad_accum_abs=zeros,
        denom=zeros, denom_abs=zeros,
        max_radii2d=zeros,
    )


def reset_opacity(model: GaussianModel, ceiling: float = 0.01) -> GaussianModel:
    """Clamp opacities to <= ceiling; zero opacity Adam moments
    (gaussian_model.py:302-305)."""
    new_op = jax.nn.sigmoid(model.params.opacity_logit)
    new_op = jnp.minimum(new_op, ceiling)
    logit = jnp.log(new_op) - jnp.log1p(-new_op)
    return model.replace(
        params=model.params.replace(opacity_logit=logit),
        mu=model.mu.replace(opacity_logit=jnp.zeros_like(logit)),
        nu=model.nu.replace(opacity_logit=jnp.zeros_like(logit)),
    )


def decay_opacity(model: GaussianModel, factor: float) -> GaussianModel:
    op = jax.nn.sigmoid(model.params.opacity_logit) * factor
    logit = jnp.log(op) - jnp.log1p(-op)
    return model.replace(
        params=model.params.replace(opacity_logit=logit),
        mu=model.mu.replace(opacity_logit=jnp.zeros_like(logit)),
        nu=model.nu.replace(opacity_logit=jnp.zeros_like(logit)),
    )


def oneup_sh_degree(model: GaussianModel) -> GaussianModel:
    return model.replace(active_sh_degree=jnp.minimum(
        model.active_sh_degree + 1, model.max_sh_degree))
