"""Native C++ runtime + eval-stack tests."""
import io
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.core.knn import mean_sq_dist_to_3nn
from ibgs_tpu.utils import native


def test_native_knn_matches_jax():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    pts = rng.random((2000, 3)).astype(np.float32)
    a = native.knn_mean_sq_dist_3(pts)
    b = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts)))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-8)


def test_native_colmap_points_matches_python(tmp_path):
    # synthesise a points3D.bin with variable-length tracks
    rng = np.random.default_rng(1)
    n = 57
    xyz = rng.random((n, 3))
    rgb = (rng.random((n, 3)) * 255).astype(np.uint8)
    errs = rng.random(n) * 4.0
    tlens = rng.integers(0, 5, n)
    buf = io.BytesIO()
    buf.write(struct.pack("<Q", n))
    for i in range(n):
        buf.write(struct.pack("<Q", i))
        buf.write(struct.pack("<3d", *xyz[i]))
        buf.write(struct.pack("<3B", *rgb[i]))
        buf.write(struct.pack("<d", errs[i]))
        buf.write(struct.pack("<Q", int(tlens[i])))
        buf.write(b"\x00" * (8 * int(tlens[i])))
    p = tmp_path / "points3D.bin"
    p.write_bytes(buf.getvalue())

    from ibgs_tpu.data.colmap import read_points3d_bin
    x1, c1, e1, t1 = read_points3d_bin(str(p))
    np.testing.assert_allclose(x1, xyz)
    np.testing.assert_array_equal(c1, rgb)
    np.testing.assert_allclose(e1, errs)
    np.testing.assert_array_equal(t1, tlens)
    if native.available():
        x2, c2, e2, t2 = native.parse_colmap_points3d(str(p))
        np.testing.assert_allclose(x2, xyz)
        np.testing.assert_array_equal(c2, rgb)
        np.testing.assert_allclose(e2, errs)
        np.testing.assert_array_equal(t2, tlens)


def test_marching_tets_sphere():
    from ibgs_tpu.eval.tsdf import marching_cubes
    g = np.linspace(-1, 1, 32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vol = np.sqrt(X**2 + Y**2 + Z**2) - 0.55
    v, f = marching_cubes(vol, 0.0)
    assert len(v) > 500 and len(f) > 1000
    r = np.linalg.norm(v * (2 / 31) - 1.0, axis=-1)
    assert abs(r.mean() - 0.55) < 0.01 and r.std() < 0.01


def test_tsdf_fusion_plane():
    """Fuse synthetic depth maps of a fronto-parallel plane."""
    from ibgs_tpu.eval.tsdf import TSDFVolume
    H = W = 32
    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    depth = np.full((H, W), 2.0, np.float32)
    img = np.ones((H, W, 3), np.float32) * 0.5
    vol = TSDFVolume([-1, -1, 1.0], [1, 1, 3.0], voxel_size=0.05)
    vol.integrate(depth, img, K, np.eye(4, dtype=np.float32))
    verts, faces = vol.extract_mesh()
    assert len(verts) > 50
    # surface should sit near z = 2
    assert abs(np.median(verts[:, 2]) - 2.0) < 0.08


def test_geometry_eval_roundtrip(tmp_path):
    from ibgs_tpu.eval.tsdf import marching_cubes, save_mesh_ply
    import scripts.eval_geometry as ge
    g = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    v, f = marching_cubes(np.sqrt(X**2 + Y**2 + Z**2) - 0.5, 0.0)
    p = str(tmp_path / "m.ply")
    save_mesh_ply(p, v, f)
    out = ge.main(["fscore", "--mesh", p, "--gt", p, "--threshold", "0.05"])
    assert out["fscore"] > 0.99
    out2 = ge.main(["chamfer", "--mesh", p, "--gt", p, "--downsample", "0"])
    assert out2["overall"] < 1e-3


def test_fscore_align_recovers_similarity(tmp_path):
    """--align must register a rotated+translated+scaled copy of GT back
    to fscore ≈ 1 (VERDICT r3 #7; reference tnt_eval/registration.py)."""
    from scipy.spatial.transform import Rotation
    from ibgs_tpu.eval.tsdf import marching_cubes, save_mesh_ply
    import scripts.eval_geometry as ge
    g = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    # anisotropic blob so principal axes are well-defined
    v, f = marching_cubes(
        np.sqrt(X**2 + (Y / 0.6)**2 + (Z / 0.8)**2) - 0.55, 0.0)
    gt_p = str(tmp_path / "gt.ply")
    save_mesh_ply(gt_p, v, f)
    R = Rotation.from_euler("xyz", [50, -30, 110], degrees=True).as_matrix()
    v2 = 1.7 * v @ R.T + np.array([5.0, -3.0, 2.0])
    m_p = str(tmp_path / "m.ply")
    save_mesh_ply(m_p, v2.astype(np.float32), f)
    misreg = ge.main(["fscore", "--mesh", m_p, "--gt", gt_p,
                      "--threshold", "0.05"])
    assert misreg["fscore"] < 0.1
    out = ge.main(["fscore", "--mesh", m_p, "--gt", gt_p,
                   "--threshold", "0.05", "--align"])
    assert out["fscore"] > 0.99, out
    # trajectory-seeded variant: index-matched camera centres
    traj_gt = v[::57][:40]
    traj = 1.7 * traj_gt @ R.T + np.array([5.0, -3.0, 2.0])
    np.save(tmp_path / "traj.npy", traj)
    np.save(tmp_path / "gt_traj.npy", traj_gt)
    out2 = ge.main(["fscore", "--mesh", m_p, "--gt", gt_p,
                    "--threshold", "0.05", "--align",
                    "--traj", str(tmp_path / "traj.npy"),
                    "--gt_traj", str(tmp_path / "gt_traj.npy")])
    assert out2["fscore"] > 0.99, out2


def test_lpips_module_shape():
    """LPIPS with random weights: runs and returns 0 for identical images."""
    from ibgs_tpu.eval.lpips import LPIPS, _CFG
    rng = np.random.default_rng(0)
    convs = []
    cin = 3
    for c in _CFG:
        if c == "M":
            continue
        convs.append((jnp.asarray(rng.normal(0, 0.05, (c, cin, 3, 3)),
                                  jnp.float32),
                      jnp.zeros((c,), jnp.float32)))
        cin = c
    lins = [jnp.asarray(np.abs(rng.normal(0, 1, (ch,))), jnp.float32)
            for ch in (64, 128, 256, 512, 512)]
    lp = LPIPS(convs, lins)
    img = rng.random((32, 32, 3)).astype(np.float32)
    d0 = float(lp(img, img))
    d1 = float(lp(img, rng.random((32, 32, 3)).astype(np.float32)))
    assert abs(d0) < 1e-6 and d1 > 0
