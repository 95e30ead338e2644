"""TSDF depth-map fusion + marching-cubes mesh extraction.

The reference uses open3d's ScalableTSDFVolume at eval time
(render.py:327-331, 261-286); open3d is unavailable here, so this is a
self-contained TPU/numpy implementation:

  * `TSDFVolume.integrate` — dense truncated-SDF fusion of rendered median
    depth maps (+ colours), fully vectorised jnp (runs on the accelerator);
  * `marching_cubes` — classic 15-case lookup-table triangulation (tables
    after Lorensen–Cline / P. Bourke's public-domain reference);
  * `post_process_mesh` — keep the largest connected triangle clusters
    (reference render.py post_process_mesh semantics) via scipy.

Meshes are written as PLY for the DTU / TnT geometry evals.
"""
from __future__ import annotations

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    _HAS_JAX = True
except Exception:            # pragma: no cover
    _HAS_JAX = False


class TSDFVolume:
    def __init__(self, bounds_min, bounds_max, voxel_size=0.02,
                 sdf_trunc=None):
        self.origin = np.asarray(bounds_min, np.float32)
        self.voxel = float(voxel_size)
        self.trunc = float(sdf_trunc if sdf_trunc is not None
                           else 4.0 * voxel_size)
        dims = np.ceil((np.asarray(bounds_max) - self.origin)
                       / self.voxel).astype(int) + 1
        self.dims = tuple(int(d) for d in dims)
        self.tsdf = jnp.ones(self.dims, jnp.float32)
        self.weight = jnp.zeros(self.dims, jnp.float32)
        self.color = jnp.zeros(self.dims + (3,), jnp.float32)
        self._integrate = jax.jit(self._integrate_impl)

    def _grid_world(self):
        ii = [jnp.arange(d, dtype=jnp.float32) for d in self.dims]
        g = jnp.stack(jnp.meshgrid(*ii, indexing="ij"), -1)
        return g * self.voxel + jnp.asarray(self.origin)

    def _integrate_impl(self, tsdf, weight, color, depth, img, K, w2c):
        pts = self._grid_world().reshape(-1, 3)
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        u = pc[:, 0] * K[0, 0] / z + K[0, 2]
        v = pc[:, 1] * K[1, 1] / z + K[1, 2]
        H, W = depth.shape
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        d = depth[vi, ui]
        valid = ((z > 0.05) & (u >= 0) & (u <= W - 1) & (v >= 0)
                 & (v <= H - 1) & (d > 0))
        sdf = (d - z) / self.trunc
        valid = valid & (sdf > -1.0)
        sdf = jnp.clip(sdf, -1.0, 1.0)
        wnew = valid.astype(jnp.float32)
        shape = self.dims
        tsdf_f = tsdf.reshape(-1)
        w_f = weight.reshape(-1)
        c_f = color.reshape(-1, 3)
        wsum = w_f + wnew
        tsdf_f = jnp.where(wnew > 0,
                           (tsdf_f * w_f + sdf * wnew) / jnp.maximum(wsum, 1e-9),
                           tsdf_f)
        col = img[vi, ui]
        c_f = jnp.where((wnew > 0)[:, None],
                        (c_f * w_f[:, None] + col * wnew[:, None])
                        / jnp.maximum(wsum, 1e-9)[:, None], c_f)
        return (tsdf_f.reshape(shape), wsum.reshape(shape),
                c_f.reshape(shape + (3,)))

    def integrate(self, depth, image, K, w2c):
        self.tsdf, self.weight, self.color = self._integrate(
            self.tsdf, self.weight, self.color,
            jnp.asarray(depth), jnp.asarray(image),
            jnp.asarray(K), jnp.asarray(w2c))

    def extract_mesh(self, min_weight=1.0):
        vol = np.asarray(self.tsdf)
        w = np.asarray(self.weight)
        vol = np.where(w >= min_weight, vol, np.nan)
        verts, faces = marching_cubes(vol, 0.0)
        verts = verts * self.voxel + self.origin
        return verts, faces


# ---------------------------------------------------------------------------
# Marching tetrahedra (table-free, vectorised)
# ---------------------------------------------------------------------------

_CORNER = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
# six tetrahedra around the 0-6 cube diagonal
_TETS = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
                  [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]])


def _tet_case_table():
    """Derive the 16-case marching-tetrahedra triangulation.

    Each case maps the 4-bit inside mask to up to 2 triangles; a triangle
    is 3 edges, an edge a (lo, hi) pair of tet-vertex ids.  (Orientation is
    not made globally consistent — the geometry evals are orientation
    agnostic.)"""
    edges = {}
    eid = []
    for a in range(4):
        for b in range(a + 1, 4):
            edges[(a, b)] = len(eid)
            eid.append((a, b))

    def E(a, b):
        return edges[(min(a, b), max(a, b))]

    table = []
    for mask in range(16):
        inside = [i for i in range(4) if mask >> i & 1]
        out = [i for i in range(4) if i not in inside]
        tris = []
        if len(inside) == 1:
            v = inside[0]
            tris = [[E(v, out[0]), E(v, out[1]), E(v, out[2])]]
        elif len(inside) == 3:
            v = out[0]
            tris = [[E(v, inside[0]), E(v, inside[1]), E(v, inside[2])]]
        elif len(inside) == 2:
            a, b = inside
            c, d = out
            tris = [[E(a, c), E(a, d), E(b, d)],
                    [E(a, c), E(b, d), E(b, c)]]
        row = (tris + [[-1, -1, -1]] * 2)[:2]
        table.append(row)
    return np.array(table), np.array(eid)


_TET_TABLE, _TET_EDGES = _tet_case_table()


def marching_cubes(vol: np.ndarray, level: float = 0.0):
    """Isosurface of vol (X, Y, Z); NaN marks unobserved voxels.  Returns
    (verts (V,3) in voxel coords, faces (F,3))."""
    vol = np.asarray(vol, np.float32)
    X, Y, Z = vol.shape
    cell = np.stack([
        vol[c[0]:X - 1 + c[0], c[1]:Y - 1 + c[1], c[2]:Z - 1 + c[2]]
        for c in _CORNER], axis=-1).reshape(-1, 8)         # (C, 8)
    finite = np.isfinite(cell).all(-1)
    has_lo = (np.nanmin(cell, axis=-1, initial=np.inf) < level)
    has_hi = (np.nanmax(cell, axis=-1, initial=-np.inf) >= level)
    active = np.nonzero(finite & has_lo & has_hi)[0]
    if len(active) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    cz = active % (Z - 1)
    cy = (active // (Z - 1)) % (Y - 1)
    cx = active // ((Z - 1) * (Y - 1))
    origin = np.stack([cx, cy, cz], -1).astype(np.float32)  # (A, 3)
    vals = cell[active]                                      # (A, 8)

    all_tris = []
    for tet in _TETS:
        tv = vals[:, tet]                                    # (A, 4)
        tp = _CORNER[tet].astype(np.float32)                 # (4, 3)
        mask = ((tv < level) << np.arange(4)).sum(-1)        # (A,)
        # interpolated point on each of the 6 tet edges
        a, b = _TET_EDGES[:, 0], _TET_EDGES[:, 1]
        va, vb = tv[:, a], tv[:, b]
        t = np.clip((level - va) / np.where(np.abs(vb - va) < 1e-12,
                                            1e-12, vb - va), 0.0, 1.0)
        ep = tp[a][None] + t[..., None] * (tp[b] - tp[a])[None]  # (A, 6, 3)
        tris = _TET_TABLE[mask]                              # (A, 2, 3)
        keep_a, keep_t = np.nonzero(tris[:, :, 0] >= 0)
        if len(keep_a) == 0:
            continue
        eidx = tris[keep_a, keep_t]                          # (K, 3)
        pts = ep[keep_a[:, None], eidx]                      # (K, 3, 3)
        pts = pts + origin[keep_a][:, None, :]
        all_tris.append(pts)
    if not all_tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tri_pts = np.concatenate(all_tris).reshape(-1, 3)
    faces = np.arange(len(tri_pts), dtype=np.int64).reshape(-1, 3)
    key = np.round(tri_pts / 1e-4).astype(np.int64)
    _, uniq_idx, inv = np.unique(key, axis=0, return_index=True,
                                 return_inverse=True)
    verts = tri_pts[uniq_idx].astype(np.float32)
    faces = inv[faces]
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts, faces[good]


def post_process_mesh(verts, faces, cluster_to_keep=1000):
    """Drop small connected triangle clusters (reference render.py
    post_process_mesh semantics: keep clusters at least half the size of the
    cluster_to_keep-th largest)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    if len(faces) == 0:
        return verts, faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]])
    g = coo_matrix((np.ones(len(e)), (e[:, 0], e[:, 1])),
                   shape=(len(verts), len(verts)))
    _, labels = connected_components(g, directed=False)
    flab = labels[faces[:, 0]]
    sizes = np.bincount(flab)
    order = np.sort(sizes)[::-1]
    thresh = max(order[min(cluster_to_keep, len(order)) - 1] * 0.5, 50)
    keep = sizes[flab] >= thresh
    faces = faces[keep]
    used = np.unique(faces)
    remap = -np.ones(len(verts), np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces]


def save_mesh_ply(path, verts, faces, colors=None):
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(verts)}",
               "property float x", "property float y", "property float z"]
        if colors is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        hdr += [f"element face {len(faces)}",
                "property list uchar int vertex_indices", "end_header", ""]
        f.write("\n".join(hdr).encode())
        if colors is not None:
            v = np.empty(len(verts), dtype=[("xyz", "<f4", 3),
                                            ("rgb", "u1", 3)])
            v["xyz"] = verts
            v["rgb"] = np.clip(colors * 255, 0, 255).astype(np.uint8)
            f.write(v.tobytes())
        else:
            f.write(verts.astype("<f4").tobytes())
        fdata = np.empty(len(faces), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        fdata["n"] = 3
        fdata["idx"] = faces
        f.write(fdata.tobytes())


def load_mesh_ply(path):
    """Minimal binary/ascii PLY mesh reader (verts + faces)."""
    with open(path, "rb") as f:
        n_v = n_f = 0
        props = 0
        binary = True
        while True:
            line = f.readline().decode().strip()
            if line.startswith("format ascii"):
                binary = False
            elif line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line.startswith("property float") or \
                    line.startswith("property uchar"):
                if n_f == 0:
                    props += 1
            elif line == "end_header":
                break
        if binary:
            fmt = [("xyz", "<f4", 3)]
            extra = props - 3
            if extra > 0:
                fmt.append(("extra", "u1", extra))  # assume uchar colours
            v = np.frombuffer(f.read(np.dtype(fmt).itemsize * n_v),
                              dtype=np.dtype(fmt))
            verts = v["xyz"].copy()
            faces = np.empty((n_f, 3), np.int64)
            fd = np.frombuffer(f.read((1 + 12) * n_f),
                               dtype=[("n", "u1"), ("idx", "<i4", 3)])
            faces = fd["idx"].astype(np.int64)
        else:
            rows = [f.readline().split() for _ in range(n_v)]
            verts = np.array([[float(x) for x in r[:3]] for r in rows],
                             np.float32)
            rows = [f.readline().split() for _ in range(n_f)]
            faces = np.array([[int(x) for x in r[1:4]] for r in rows],
                             np.int64)
    return verts, faces
