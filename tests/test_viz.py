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
