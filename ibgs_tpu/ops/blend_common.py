"""Shared definitions for the blend stage (oracle and Pallas backends)."""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

ALPHA_CLAMP = 0.99           # max per-splat alpha (reference forward.cu:424)
ALPHA_MIN = 1.0 / 255.0      # contribution cutoff
T_STOP = 1.0e-4              # transmittance early-stop
PLANE_EPS = 1.0e-8           # ray·normal denominator epsilon
MAX_BUFFER = 8               # compiled max median-buffer length


@dataclasses.dataclass(frozen=True)
class BlendConfig:
    """Static configuration of the blend stage."""
    tile_h: int = 8
    tile_w: int = 16
    buffer_len: int = 4
    render_geo: bool = True
    depth_only: bool = False

    @property
    def before_cap(self) -> int:
        # circular "above the median" sub-buffer capacity (forward.cu:384)
        return (self.buffer_len + 1) // 2

    @property
    def below_cap(self) -> int:
        return self.buffer_len - self.before_cap


@struct.dataclass
class Instances:
    """Per-instance (tile-duplicated, depth-sorted) splat attributes.

    All arrays have leading dim `cap`.  These are differentiable inputs to
    the blend stage — their cotangents are per-instance gradients which the
    gather that produced them turns into per-Gaussian gradients
    (deterministic segment-sum; the TPU replacement for CUDA atomicAdd).
    """
    mean2d: jnp.ndarray   # (cap, 2)
    conic: jnp.ndarray    # (cap, 3)
    opacity: jnp.ndarray  # (cap,)
    rgb: jnp.ndarray      # (cap, 3)
    normal: jnp.ndarray   # (cap, 3) camera-space plane normal
    dist: jnp.ndarray     # (cap,) camera-space plane offset


@struct.dataclass
class BlendOutputs:
    """Per-pixel blend results. H, W are the padded tile-aligned dims."""
    color: jnp.ndarray       # (H, W, 3) alpha-composited splat color (no bg)
    normal: jnp.ndarray      # (H, W, 3) alpha-composited plane normals
    final_t: jnp.ndarray     # (H, W) remaining transmittance
    n_contrib: jnp.ndarray   # (H, W) int32 1-based index of last contributor
    buf_depth: jnp.ndarray   # (H, W, B) median-buffer plane depths
    buf_weight: jnp.ndarray  # (H, W, B) median-buffer blend weights (αT)
    buf_contrib: jnp.ndarray  # (H, W, B) int32 1-based contributor positions
