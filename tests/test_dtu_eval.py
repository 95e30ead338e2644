"""DTU-specific geometry evaluation: mask culling + ObsMask/plane-aware
chamfer (reference scripts/eval_dtu/evaluate_single_scene.py + eval.py)."""
import numpy as np
from scipy.io import savemat

import scripts.eval_geometry as ge
from ibgs_tpu.eval.tsdf import load_mesh_ply, marching_cubes, save_mesh_ply


def _sphere_mesh(r=0.5, n=24):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    v, f = marching_cubes(np.sqrt(X**2 + Y**2 + Z**2) - r, 0.0)
    return v / (n - 1) * 2.0 - 1.0, f    # grid-index → world [-1, 1]


def test_cull_mesh_masks(tmp_path):
    """Vertices projecting off the foreground mask in any view are culled;
    survivors get the scale_mat transform (evaluate_single_scene.py:53-100)."""
    from PIL import Image
    v, f = _sphere_mesh()
    # an off-object blob: projects INSIDE view 0 but off its (dilated)
    # mask → culled.  (Points projecting outside a view are kept for that
    # view, per the reference's `1 - valid` term.)
    out_v = v * 0.25 + np.array([1.3, 0.0, -0.15])
    verts = np.concatenate([v, out_v])
    faces = np.concatenate([f, f + len(v)])
    mesh_p = str(tmp_path / "mesh.ply")
    save_mesh_ply(mesh_p, verts, faces)

    inst = tmp_path / "scan"
    (inst / "mask").mkdir(parents=True)
    W, H, fl = 200, 160, 120.0
    cams = {}
    K = np.array([[fl, 0, W / 2], [0, fl, H / 2], [0, 0, 1.0]])
    for i, ang in enumerate([0.0, np.pi / 2]):
        # camera on a ring at radius 4 looking at the origin
        eye = np.array([4 * np.sin(ang), 0.0, -4 * np.cos(ang)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])         # w2c rows
        t = -R @ eye
        P = np.eye(4)
        P[:3, :3] = K @ R
        P[:3, 3] = K @ t
        cams[f"world_mat_{i}"] = P.astype(np.float32)
        cams[f"scale_mat_{i}"] = np.diag([2.0, 2.0, 2.0, 1.0]).astype(
            np.float32)
        # mask = projection of the TRUE sphere only (central disk).
        # Masks live in WORLD space: the cull projects normalized mesh
        # points through world_mat @ scale_mat, so the world object is the
        # normalized mesh scaled by 2.
        m = np.zeros((H, W), np.uint8)
        uv = (K @ (R @ (2.0 * verts[: len(v)]).T + t[:, None]))
        u = (uv[0] / uv[2]).astype(int)
        vv = (uv[1] / uv[2]).astype(int)
        ok = (u >= 0) & (u < W) & (vv >= 0) & (vv < H)
        m[vv[ok], u[ok]] = 255
        Image.fromarray(m).save(inst / "mask" / f"{i:03d}.png")
    np.savez(inst / "cameras.npz", **cams)

    out_p = str(tmp_path / "culled.ply")
    ge.main(["cull", "--mesh", mesh_p, "--instance_dir", str(inst),
             "--out", out_p])
    cv, cf = load_mesh_ply(out_p)
    # outlier blob culled, sphere kept (scaled by 2)
    assert len(cv) <= 1.05 * len(v) and len(cv) > 0.8 * len(v), \
        (len(cv), len(v), len(verts))
    assert abs(np.linalg.norm(cv, axis=1).max() - 1.0) < 0.2  # 0.5 * 2


def test_chamfer_obsmask_plane(tmp_path):
    """ObsMask grid culls unobserved data points; the ground plane cuts the
    GT below it (eval.py:98-133)."""
    v, f = _sphere_mesh()
    mesh_p = str(tmp_path / "m.ply")
    save_mesh_ply(mesh_p, v, f)
    # GT = same sphere + junk far below the ground plane
    junk = np.random.default_rng(0).normal(0, 0.2, (500, 3)) \
        + np.array([0, -30.0, 0])
    gt_p = str(tmp_path / "gt.ply")
    save_mesh_ply(gt_p, np.concatenate([v, junk]), f)

    om_dir = tmp_path / "ObsMask"
    om_dir.mkdir()
    BB = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]], np.float32)
    Res = np.array([[0.5]])
    shape = tuple(int(x) for x in np.ceil((BB[1] - BB[0]) / 0.5) + 1)
    savemat(om_dir / "ObsMask1_10.mat",
            {"ObsMask": np.ones(shape, np.uint8), "BB": BB, "Res": Res})
    savemat(om_dir / "Plane1.mat",
            {"P": np.array([[0.0], [1.0], [0.0], [2.0]])})  # y > -2 kept

    out = ge.main(["chamfer", "--mesh", mesh_p, "--gt", gt_p,
                   "--downsample", "0", "--max_dist", "10",
                   "--obsmask_dir", str(om_dir), "--scan", "1",
                   "--patch_size", "1"])
    # junk GT is below the plane → culled → near-zero chamfer both ways
    assert out["overall"] < 0.05, out
