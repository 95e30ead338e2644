import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.core import sh as shlib
from ibgs_tpu.core import transforms as tf
from ibgs_tpu.core.camera import look_at_camera, make_camera


def test_quat_identity():
    R = tf.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_quat_axis_rotation():
    # 90° about z (wxyz)
    c = np.cos(np.pi / 4)
    q = jnp.array([c, 0.0, 0.0, c])
    R = tf.quat_to_rotmat(q)
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_covariance_matches_scales():
    q = jnp.array([[1.0, 0, 0, 0]])
    s = jnp.array([[0.5, 1.0, 2.0]])
    cov = tf.build_covariance_3d(s, q)[0]
    np.testing.assert_allclose(cov, np.diag([0.25, 1.0, 4.0]), atol=1e-6)


def test_covariance_rotation_invariant_trace():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (10, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    s = jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (10, 3)))
    cov = tf.build_covariance_3d(s, q)
    np.testing.assert_allclose(
        jnp.trace(cov, axis1=-2, axis2=-1), (s**2).sum(-1), rtol=1e-5
    )


def test_camera_roundtrip():
    cam = look_at_camera([0, 0, -4], [0, 0, 0], [0, -1, 0], 0.8, 0.8, 64, 64)
    # origin should be 4 in front of the camera and project to image centre
    pv = tf.apply_transform(cam.view, jnp.zeros((1, 3)))[0]
    np.testing.assert_allclose(pv, [0, 0, 4], atol=1e-5)
    ndc = tf.project_hom(cam.full_proj, jnp.zeros((1, 3)))[0]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-5)
    px = tf.ndc_to_pixel(ndc[0], 64)
    assert abs(float(px) - 31.5) < 1e-4
    np.testing.assert_allclose(cam.cam_pos, [0, 0, -4], atol=1e-5)


def test_sh_degree0_is_constant():
    c = jnp.zeros((4, 1, 3)).at[:, 0, :].set(1.0)
    dirs = tf.normalize(jax.random.normal(jax.random.PRNGKey(0), (4, 3)))
    out = shlib.eval_sh(c, dirs, 0, 0)
    np.testing.assert_allclose(out, shlib.C0, rtol=1e-6)


def test_sh_roundtrip_rgb():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(shlib.sh0_to_rgb(shlib.rgb_to_sh0(rgb)), rgb, rtol=1e-6)


def test_sh_degree_mask_ramps():
    m0 = shlib.degree_mask(2, 0)
    m2 = shlib.degree_mask(2, 2)
    assert m0.sum() == 1 and m2.sum() == 9


def test_sh_matches_bruteforce_degree2():
    key = jax.random.PRNGKey(3)
    coeffs = jax.random.normal(key, (5, 9, 3))
    dirs = tf.normalize(jax.random.normal(jax.random.PRNGKey(4), (5, 3)))
    out = shlib.eval_sh(coeffs, dirs, 2, 2)
    # brute force with explicit constants
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    basis = jnp.stack(
        [
            jnp.full_like(x, shlib.C0),
            -shlib.C1 * y, shlib.C1 * z, -shlib.C1 * x,
            shlib.C2[0] * x * y, shlib.C2[1] * y * z,
            shlib.C2[2] * (2 * z * z - x * x - y * y),
            shlib.C2[3] * x * z, shlib.C2[4] * (x * x - y * y),
        ],
        axis=-1,
    )
    ref = jnp.einsum("pk,pkc->pc", basis, coeffs)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
