"""GaussianModel state management: init, adam, densify, prune, opacity ops."""
import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.core.knn import mean_sq_dist_to_3nn
from ibgs_tpu.models import gaussians as G


def _tiny_model(n=50, cap=128):
    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    col = rng.random((n, 3)).astype(np.float32)
    return G.init_from_points(pts, col, max_sh_degree=2, capacity=cap)


def test_knn_exact_matches_bruteforce():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.random((300, 3)), jnp.float32)
    d = np.asarray(mean_sq_dist_to_3nn(pts, block=64))
    # brute force
    diff = np.asarray(pts)[:, None] - np.asarray(pts)[None]
    dist = (diff ** 2).sum(-1)
    np.fill_diagonal(dist, np.inf)
    ref = np.sort(dist, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(d, ref, rtol=1e-4)


def test_init_shapes_and_mask():
    m = _tiny_model()
    assert m.capacity == 128
    assert int(m.n_alive) == 50
    assert m.sh_coeffs.shape == (128, 9, 3)
    np.testing.assert_allclose(np.asarray(m.opacity[:50]), 0.1, atol=1e-5)


def test_adam_moves_params():
    m = _tiny_model()
    grads = jax.tree.map(jnp.ones_like, m.params)
    lrs = G.lr_tree(G.LRConfig(), 0.0, 1.0)
    m2 = G.adam_step(m, grads, lrs)
    assert int(m2.step) == 1
    assert not np.allclose(np.asarray(m2.params.xyz), np.asarray(m.params.xyz))


def test_opacity_reset_and_decay():
    m = _tiny_model()
    m2 = G.reset_opacity(m, 0.01)
    assert float(m2.opacity[:50].max()) <= 0.0101
    m3 = G.decay_opacity(m, 0.5)
    np.testing.assert_allclose(np.asarray(m3.opacity[:50]), 0.05, rtol=1e-4)


def test_densify_clone_grows():
    m = _tiny_model()
    # force every alive splat to look like a clone candidate
    m = m.replace(
        grad_accum=jnp.where(m.alive, 1.0, 0.0),
        denom=jnp.ones_like(m.denom),
        params=m.params.replace(log_scale=jnp.full_like(
            m.params.log_scale, -8.0)),   # tiny → clone branch
    )
    cfg = G.DensifyConfig(grad_threshold=1e-4, opacity_cull=0.0)
    m2 = G.densify_and_prune(m, jax.random.PRNGKey(0), cfg, scene_extent=1.0)
    assert int(m2.n_alive) == 100   # each of 50 cloned once
    # stats must be reset
    assert float(m2.grad_accum.sum()) == 0.0


def test_densify_split_keeps_count_and_prune_culls():
    m = _tiny_model()
    m = m.replace(
        grad_accum=jnp.where(m.alive, 1.0, 0.0),
        denom=jnp.ones_like(m.denom),
        params=m.params.replace(log_scale=jnp.full_like(
            m.params.log_scale, 0.0)),    # big → split branch
    )
    cfg = G.DensifyConfig(grad_threshold=1e-4, opacity_cull=0.0)
    m2 = G.densify_and_prune(m, jax.random.PRNGKey(0), cfg, scene_extent=1.0)
    assert int(m2.n_alive) == 100   # parent → 2 children
    # children shrunk by 1.6x in scale
    ls = np.asarray(m2.params.log_scale)[np.asarray(m2.alive)]
    np.testing.assert_allclose(ls, -np.log(1.6), atol=1e-5)

    # opacity prune removes everything when threshold = 1
    cfg2 = G.DensifyConfig(grad_threshold=9.9, opacity_cull=0.99)
    m3 = G.densify_and_prune(m2, jax.random.PRNGKey(1), cfg2, 1.0)
    assert int(m3.n_alive) == 0


def test_capacity_respected_on_overflow():
    m = _tiny_model(n=100, cap=128)
    m = m.replace(grad_accum=jnp.where(m.alive, 1.0, 0.0),
                  denom=jnp.ones_like(m.denom),
                  params=m.params.replace(log_scale=jnp.full_like(
                      m.params.log_scale, -8.0)))
    cfg = G.DensifyConfig(grad_threshold=1e-4, opacity_cull=0.0)
    m2 = G.densify_and_prune(m, jax.random.PRNGKey(0), cfg, 1.0)
    assert int(m2.n_alive) == 128   # clamped at capacity, no overflow

    m3 = G.grow_capacity(m2, 256)
    assert m3.capacity == 256 and int(m3.n_alive) == 128


def test_oriented_normal_faces_camera():
    m = _tiny_model()
    cam_pos = jnp.array([0.0, 0.0, -5.0])
    n, off = m.oriented_normal(cam_pos, learnt=True)
    to_cam = cam_pos - m.params.xyz
    dots = (n * to_cam).sum(-1)[np.asarray(m.alive)]
    assert (np.asarray(dots) >= 0).all()


def test_init_large_n_native_knn_path():
    """N>200k routes initial scales through the native host KNN
    (models/gaussians.py init_from_points); scales must match the exact
    JAX 3-NN on a verifiable subsample and be finite everywhere."""
    rng = np.random.default_rng(7)
    n = 250_000
    pts = (rng.random((n, 3)).astype(np.float32) * 2 - 1)
    col = rng.random((n, 3)).astype(np.float32)
    m = G.init_from_points(pts, col, max_sh_degree=1, capacity=262144)
    ls = np.asarray(m.params.log_scale)[:n]
    assert np.isfinite(ls).all()
    # exact check on the first 2k points: native KNN is exact, so the
    # 3-NN distances (over the FULL cloud) must match the JAX oracle
    from ibgs_tpu.utils import native
    if native.available():
        from ibgs_tpu.core.knn import mean_sq_dist_to_3nn
        import jax.numpy as jnp
        d2_native = np.exp(2.0 * ls[:, 0])
        # oracle over the full cloud is O(N^2)=too big; instead re-run
        # native on a permuted copy — exactness means permutation
        # invariance of each point's 3-NN distance
        perm = rng.permutation(n)
        d2_perm = native.knn_mean_sq_dist_3(pts[perm])
        inv = np.empty(n, np.int64); inv[perm] = np.arange(n)
        np.testing.assert_allclose(d2_perm[inv], d2_native, rtol=2e-4)
