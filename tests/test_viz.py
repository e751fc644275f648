"""Visualization smoke tests — analog of the reference's Plots/Makie
extension behavior (`ext/WaterLilyPlotsExt.jl`, `ext/WaterLilyMakieExt.jl`):
every entry point renders to a file without error and the file is non-empty.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.utils import viz
from waterlily_tpu.utils.log import SolverLogger


def _circle_sim():
    R = 4
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 3 * R) ** 2)) - R)
    return Simulation((8 * R, 6 * R), (1.0, 0.0), R, nu=R / 100, body=body)


def test_flood_and_body_plot(tmp_path):
    import matplotlib.pyplot as plt

    sim = _circle_sim()
    ax, cs = viz.flood(np.asarray(sim.flow.p))
    viz.body_plot(sim, ax=ax)
    viz.addbody([0, 1, 1], [0, 0, 1], ax=ax)
    out = tmp_path / "flood.png"
    ax.figure.savefig(out)
    plt.close("all")
    assert out.stat().st_size > 0


def test_viz_png_2d(tmp_path):
    sim = _circle_sim()
    sim.sim_step()
    out = viz.viz(sim, fname=str(tmp_path / "frame.png"))
    assert os.path.getsize(out) > 0


def test_viz_png_3d_cut(tmp_path):
    R = 4
    ctr = jnp.asarray([2.0 * R, 1.5 * R, 1.5 * R], jnp.float64)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - R)
    sim = Simulation((4 * R, 3 * R, 3 * R), (1.0, 0.0, 0.0), R, nu=R / 100,
                     body=body)
    out = viz.viz(sim, fname=str(tmp_path / "frame3d.png"))
    assert os.path.getsize(out) > 0


def test_sim_gif(tmp_path):
    sim = _circle_sim()
    out = viz.sim_gif(sim, duration=0.2, step=0.1, plotbody=True,
                      fname=str(tmp_path / "flow.gif"), fps=5)
    assert os.path.getsize(out) > 0


def test_plot_logger(tmp_path):
    sim = _circle_sim()
    log = SolverLogger(str(tmp_path / "WaterLily"))
    for _ in range(2):
        sim.sim_step()
        log.log_step(sim)
    out = viz.plot_logger(log.fname)
    assert os.path.getsize(out) > 0


def test_get_body_shape():
    sim = _circle_sim()
    s = viz.get_body(sim)
    assert s.shape == (32, 24)
    assert float(s.min()) < 0 < float(s.max())


def test_pathlines_gif(tmp_path):
    # device-advected fading pathlines (`ext/WaterLilyPathlinesExt.jl:19-58`)
    from waterlily_tpu.utils.pathlines import Particles, pathlines_gif, \
        update_particles

    sim = _circle_sim()
    sim.sim_step()
    p = Particles.init(64, sim.flow.cfg.shape, life=16, seed=1)
    p2, old, v = update_particles(p, sim)
    import numpy as np
    assert np.all(np.isfinite(np.asarray(p2.pos)))
    # particles in the free stream move with the flow (u ~ U > 0)
    moved = np.asarray(p2.pos)[:, 0] - np.asarray(old)[:, 0]
    assert moved.mean() > 0
    out = pathlines_gif(sim, n=128, duration=0.2, step=0.1, life=16,
                        fname=str(tmp_path / "pl.gif"), fps=5)
    assert os.path.getsize(out) > 0


# ------------------------------------------------------------ 3D mesh/viz
def _sphere_sim(R=4):
    ctr = jnp.asarray([2.0 * R, 1.5 * R, 1.5 * R], jnp.float64)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - R)
    return Simulation((4 * R, 3 * R, 3 * R), (1.0, 0.0, 0.0), R, nu=R / 100,
                      body=body)


def test_marching_tetrahedra_sphere():
    # analytic sphere: watertight mesh, right radius and area
    from waterlily_tpu.utils.mesh import marching_tetrahedra

    n, R = 24, 7.0
    x, y, z = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    f = np.sqrt((x - 12.0) ** 2 + (y - 12.0) ** 2 + (z - 12.0) ** 2) - R
    v, fc = marching_tetrahedra(f)
    r = np.sqrt(np.sum((v - 12.0) ** 2, axis=1))
    assert np.max(np.abs(r - R)) < 0.3
    tri = v[fc]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    assert abs(area - 4 * np.pi * R**2) / (4 * np.pi * R**2) < 0.03
    # watertight: every edge shared by exactly two triangles
    e = np.sort(np.stack([fc[:, [0, 1]], fc[:, [1, 2]], fc[:, [2, 0]]])
                .reshape(-1, 2), axis=1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    assert np.all(cnt == 2)


def test_body_mesh_and_get_body_3d():
    from waterlily_tpu.utils.mesh import body_mesh

    sim = _sphere_sim()
    v, f = body_mesh(sim)
    assert len(f) > 0
    ctr = np.array([8.0, 6.0, 6.0])
    r = np.sqrt(np.sum((v - ctr) ** 2, axis=1))
    assert np.max(np.abs(r - 4.0)) < 0.3
    v2, f2 = viz.get_body(sim)       # 3D get_body returns the mesh now
    assert v2.shape == v.shape


def test_viz3d_isosurface_png(tmp_path):
    from waterlily_tpu.utils.mesh import viz3d, write_obj, body_mesh

    sim = _sphere_sim()
    sim.sim_step()
    out = viz3d(sim, fname=str(tmp_path / "iso.png"))
    assert os.path.getsize(out) > 1000
    out2 = viz3d(sim, fname=str(tmp_path / "iso_mirror.png"), mirror=2)
    assert os.path.getsize(out2) > 1000
    obj = write_obj(str(tmp_path / "body.obj"), *body_mesh(sim))
    assert os.path.getsize(obj) > 0
