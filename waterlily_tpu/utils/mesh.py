"""Isosurface extraction and 3D rendering (host-side, numpy).

TPU-native analog of the reference's meshing/3D-viz extensions: the
marching-cubes `body_mesh` (`/root/reference/ext/WaterLilyMeshingExt.jl:13-17`)
and the Makie 3D volume/isosurface viewer
(`/root/reference/ext/WaterLilyMakieExt.jl:153-284`).  The image has no
scikit-image/pyvista, so the extractor here is a vectorized **marching
tetrahedra**: each grid cell is split into 6 tetrahedra around the main
diagonal and each tetrahedron contributes 0-2 triangles — no 256-case cube
table, identical O(N) cost, and watertight on shared tet faces.

Rendering uses matplotlib's Poly3DCollection (lazy import, like `utils.viz`).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["marching_tetrahedra", "body_mesh", "write_obj", "viz3d"]

# 6-tet (Kuhn) decomposition of the unit cube, all sharing the (0, 7)
# diagonal; cube corners indexed bit-wise (bit0 = x, bit1 = y, bit2 = z)
_TETS = ((0, 1, 3, 7), (0, 3, 2, 7), (0, 2, 6, 7),
         (0, 6, 4, 7), (0, 4, 5, 7), (0, 5, 1, 7))
# tet edges: pairs of local tet-vertex indices
_EDGES = ((0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3))
# triangles (as edge-index triples) per inside-bitmask case; complement cases
# reuse the base triangulation (orientation-agnostic — fine for rendering
# and OBJ export)
_CASES: dict[int, tuple] = {
    1: ((0, 2, 3),), 14: ((0, 2, 3),),
    2: ((0, 1, 4),), 13: ((0, 1, 4),),
    4: ((1, 2, 5),), 11: ((1, 2, 5),),
    8: ((3, 4, 5),), 7: ((3, 4, 5),),
    3: ((1, 2, 3), (1, 3, 4)), 12: ((1, 2, 3), (1, 3, 4)),
    5: ((0, 1, 5), (0, 5, 3)), 10: ((0, 1, 5), (0, 5, 3)),
    9: ((0, 4, 5), (0, 5, 2)), 6: ((0, 4, 5), (0, 5, 2)),
}


def marching_tetrahedra(field: np.ndarray, level: float = 0.0,
                        origin=(0.0, 0.0, 0.0), spacing: float = 1.0):
    """Extract the ``field == level`` isosurface of a 3D scalar array.

    Returns ``(verts, faces)``: float64 vertices (world coords =
    ``origin + spacing * index``) and int32 triangle index triples.  Fully
    vectorized; ~1.5M tets/cell-M, so 128³ extracts in well under a second.
    """
    f = np.asarray(field, np.float64) - level
    nx, ny, nz = f.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int32)
    # corner values per cell, shape (8, ncells)
    corner = np.empty((8,) + (nx - 1, ny - 1, nz - 1), np.float64)
    for c in range(8):
        dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        corner[c] = f[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
    corner = corner.reshape(8, -1)
    # cell base coordinates, shape (ncells, 3)
    gx, gy, gz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float64)
    cdelta = np.array([[c & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
                      np.float64)

    tris = []
    for tet in _TETS:
        vals = corner[list(tet)]                       # (4, ncells)
        inside = vals < 0.0
        case = (inside[0] * 1 + inside[1] * 2 + inside[2] * 4
                + inside[3] * 8).astype(np.int8)
        active = (case != 0) & (case != 15)
        if not np.any(active):
            continue
        idx = np.nonzero(active)[0]
        vals_a = vals[:, idx]                          # (4, nact)
        pos_a = base[idx][None, :, :] + cdelta[list(tet)][:, None, :]  # (4,nact,3)
        case_a = case[idx]
        # interpolated vertex on each of the 6 tet edges (nact, 6, 3)
        everts = np.empty((idx.size, 6, 3))
        for e, (a, b) in enumerate(_EDGES):
            va, vb = vals_a[a], vals_a[b]
            denom = np.where(vb - va == 0.0, 1.0, vb - va)
            t = np.clip(-va / denom, 0.0, 1.0)[:, None]
            everts[:, e] = pos_a[a] + t * (pos_a[b] - pos_a[a])
        for c, tri_list in _CASES.items():
            sel = case_a == c
            if not np.any(sel):
                continue
            for tri in tri_list:
                tris.append(everts[sel][:, list(tri)])
    if not tris:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int32)
    tri_pts = np.concatenate(tris, axis=0)             # (ntri, 3, 3)
    # weld shared vertices so the mesh is indexed (OBJ/renderers want this)
    flat = tri_pts.reshape(-1, 3)
    key = np.round(flat * 1e6).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True,
                              return_inverse=True)
    verts = flat[first] * spacing + np.asarray(origin, np.float64)
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate triangles (two welded corners equal)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    return verts, faces[ok]


def body_mesh(sim, t: Optional[float] = None, level: float = 0.0):
    """Triangle mesh of the body surface (`body_mesh` via Meshing.jl,
    `ext/WaterLilyMeshingExt.jl:13-17`): marching tetrahedra on the sdf
    sampled at cell centers, world coords (interior cell i at i + 0.5)."""
    s = np.asarray(sim.sdf_field(t))
    assert s.ndim == 3, "body_mesh needs a 3D simulation (2D: use body_plot)"
    return marching_tetrahedra(s[1:-1, 1:-1, 1:-1], level=level,
                               origin=(0.5, 0.5, 0.5))


def write_obj(fname: str, verts: np.ndarray, faces: np.ndarray) -> str:
    """Write an indexed triangle mesh as Wavefront OBJ (1-based indices)."""
    with open(fname, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:.6g} {v[1]:.6g} {v[2]:.6g}\n")
        for f in faces + 1:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")
    return fname


def _render(ax, verts, faces, color, alpha):
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    if len(faces) == 0:
        return
    pc = Poly3DCollection(verts[faces], alpha=alpha, linewidths=0.05)
    pc.set_facecolor(color)
    pc.set_edgecolor("none")
    ax.add_collection3d(pc)


def viz3d(sim, d: Optional[Callable] = None, *, level: Optional[float] = None,
          body: bool = True, fname: str = "viz3d.png", color: str = "#3b7cb8",
          body_color: str = "0.45", alpha: float = 0.55, elev: float = 18,
          azim: float = -60, mirror: Optional[int] = None):
    """Isosurface frame render of a 3D simulation (the headless analog of the
    reference's Makie volume viewer, `ext/WaterLilyMakieExt.jl:153-284`).

    ``d(sim) -> 3D field`` extracts the plotted scalar (default: vorticity
    magnitude normalized by U/L); ``level`` defaults to half the field max.
    ``body=True`` overlays the sdf-zero body mesh; ``mirror=j`` duplicates
    both meshes across the low face of axis ``j`` (the reference's symmetry
    mirroring for half-domain sims)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if d is None:
        from .metrics import vorticity

        def d(sim):
            return np.asarray(vorticity(sim.flow.state.u)) * sim.L / sim.U

    f = np.asarray(d(sim))
    assert f.ndim == 3, "viz3d needs a 3D field; use viz for 2D"
    f = f[1:-1, 1:-1, 1:-1]
    if level is None:
        level = 0.5 * float(np.max(f))
    verts, faces = marching_tetrahedra(f, level=level, origin=(0.5, 0.5, 0.5))
    meshes = [(verts, faces, color, alpha)]
    if body and sim.flow.cfg.D == 3:
        bv, bf = body_mesh(sim)
        meshes.append((bv, bf, body_color, 0.9))
    if mirror is not None:
        for v, fc, c, a in list(meshes):
            vm = v.copy()
            vm[:, mirror] = -vm[:, mirror]
            meshes.append((vm, fc, c, a))

    fig = plt.figure(figsize=(6, 5), dpi=110)
    ax = fig.add_subplot(projection="3d")
    for v, fc, c, a in meshes:
        _render(ax, v, fc, c, a)
    nx, ny, nz = [s - 2 for s in sim.flow.cfg.shape]
    lims = [[0, nx], [0, ny], [0, nz]]
    if mirror is not None:
        lims[mirror][0] = -lims[mirror][1]
    ax.set_xlim(*lims[0])
    ax.set_ylim(*lims[1])
    ax.set_zlim(*lims[2])
    ax.set_box_aspect(tuple(hi - lo for lo, hi in lims))
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)
    return fname
