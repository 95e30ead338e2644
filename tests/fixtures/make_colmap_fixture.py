"""Generator for the miniature COLMAP fixture committed under
tests/fixtures/mini_colmap/.

Synthesizes a coherent scene — a small colored point cloud and four inward-
looking pinhole cameras — and writes it in the exact binary layout COLMAP
produces (cameras.bin / images.bin / points3D.bin, format per
scene/colmap_loader.py in the reference) plus PNG images rendered by
z-buffer point splatting, so `load_scene` gets geometrically consistent
photos.  Deterministic: re-running reproduces the committed bytes.

Run:  python tests/fixtures/make_colmap_fixture.py
"""
import os
import struct

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "mini_colmap")
W, H = 64, 48
FX = FY = 60.0
N_PTS = 300
N_BAD_ERR = 4      # reprojection error 5.0 → filtered out by the loader
N_BAD_TRACK = 4    # track length 1 → filtered out by the loader
N_CAMS = 4


def look_at(eye, target, up=(0.0, 0.0, 1.0)):
    """world→cam rotation R_w2c, translation t = -R_w2c @ eye."""
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])          # rows: cam axes in world
    return R, -R @ eye


def rotmat_to_qvec(R):
    """wxyz quaternion of a rotation matrix (COLMAP convention)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def render_points(xyz, rgb, R, t):
    """z-buffered 3x3 point splats — cheap but geometrically consistent."""
    img = np.full((H, W, 3), 0.15, np.float32)
    zbuf = np.full((H, W), np.inf)
    pc = xyz @ R.T + t
    order = np.argsort(-pc[:, 2])
    for i in order:
        x, y, z = pc[i]
        if z <= 0.1:
            continue
        u, v = int(round(x * FX / z + W / 2)), int(round(y * FY / z + H / 2))
        for dv in (-1, 0, 1):
            for du in (-1, 0, 1):
                uu, vv = u + du, v + dv
                if 0 <= uu < W and 0 <= vv < H and z < zbuf[vv, uu]:
                    zbuf[vv, uu] = z
                    img[vv, uu] = rgb[i]
    return img


def main():
    os.makedirs(os.path.join(ROOT, "images"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "sparse", "0"), exist_ok=True)
    rng = np.random.default_rng(1234)
    xyz = rng.normal(0.0, 0.35, (N_PTS, 3))
    rgb = rng.uniform(0.1, 1.0, (N_PTS, 3)).astype(np.float32)

    # cameras.bin: one shared PINHOLE camera
    with open(os.path.join(ROOT, "sparse/0/cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))          # id=1, PINHOLE
        f.write(struct.pack("<4d", FX, FY, W / 2, H / 2))

    # images.bin + PNGs: four cameras on a ring looking at the origin
    from PIL import Image
    with open(os.path.join(ROOT, "sparse/0/images.bin"), "wb") as f:
        f.write(struct.pack("<Q", N_CAMS))
        for k in range(N_CAMS):
            ang = 2 * np.pi * k / N_CAMS
            eye = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang), 0.6])
            R, t = look_at(eye, np.zeros(3))
            q = rotmat_to_qvec(R)
            name = f"img_{k:03d}.png"
            f.write(struct.pack("<i", k + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            # two dummy 2D point tracks (exercises the skip path)
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ddq", 1.0, 2.0, 0))
            f.write(struct.pack("<ddq", 3.0, 4.0, 1))
            img = render_points(xyz, rgb, R, t)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(ROOT, "images", name))

    # points3D.bin with variable-length tracks.  The first N_PTS points are
    # good (error 0.5, track>=3); appended after them are N_BAD_ERR points
    # with reprojection error 5.0 and N_BAD_TRACK with track length 1, which
    # the loader must drop per the reference's quality filter
    # (scene/colmap_loader.py:144-157).
    with open(os.path.join(ROOT, "sparse/0/points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", N_PTS + N_BAD_ERR + N_BAD_TRACK))

        def write_point(pid, p, c, error, tlen):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", *(c * 255).astype(np.uint8)))
            f.write(struct.pack("<d", error))
            f.write(struct.pack("<Q", tlen))
            f.write(b"\x00" * (8 * tlen))

        for i in range(N_PTS):
            write_point(i + 1, xyz[i], rgb[i], 0.5, int(rng.integers(3, 7)))
        far = np.array([50.0, 50.0, 50.0])
        for k in range(N_BAD_ERR):
            write_point(N_PTS + 1 + k, far + k, rgb[k], 5.0, 4)
        for k in range(N_BAD_TRACK):
            write_point(N_PTS + N_BAD_ERR + 1 + k, far - k, rgb[k], 0.5, 1)
    print("fixture written to", ROOT)


if __name__ == "__main__":
    main()
