"""ibgs_tpu — a TPU-native image-based Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of IBGS
(Image-Based Gaussian Splatting, NeurIPS 2025; reference implementation is
CUDA/torch).  The compute path is organised TPU-first:

  * per-Gaussian preprocessing (projection, EWA splatting, SH shading) is
    plain `jnp` — embarrassingly parallel, differentiated by JAX autodiff;
  * tile binning / depth ordering uses XLA's sort (no hand-written radix
    sort needed on TPU);
  * the order-dependent alpha-blend — the only truly sequential stage —
    is a Pallas TPU kernel pair (forward + analytic backward) wrapped in a
    single `jax.custom_vjp`, vectorised over instance chunks x pixel lanes
    with prefix-product transmittance instead of CUDA's serial loop, and
    deterministic per-instance gradient buffers instead of atomicAdd;
  * the image-based rendering epilogue (median-depth plane intersection,
    reprojection into source views, bilinear warping, occlusion tests) is
    plain `jnp` gathers differentiated by autodiff.

Multi-device scaling uses `jax.sharding.Mesh` + `shard_map`: image tiles
sharded over one mesh axis, camera batches over another, per-Gaussian
gradients psum'd over the tile axis via XLA collectives on ICI.
"""

__version__ = "0.1.0"
