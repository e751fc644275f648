"""Checkpoint / VTK round-trip tests — ports of `/root/reference/test/test_ioext.jl`."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.utils.io import VTKWriter, load, load_state, load_vtk, save_state
from waterlily_tpu.utils.log import SolverLogger, parse_log
from waterlily_tpu.utils.metrics import MeanFlow

F32 = jnp.float32


def make_sim(D=2):
    dims = (16, 16) if D == 2 else (16, 16, 16)
    ubc = (1.0, 0.0) if D == 2 else (1.0, 0.0, 0.0)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 8.0) ** 2)) - 4.0)
    return Simulation(dims, ubc, 4.0, nu=0.02, body=body, dtype=F32)


@pytest.mark.parametrize("D", [2, 3])
def test_npz_roundtrip(tmp_path, D):
    sim = make_sim(D)
    sim.sim_step(0.2, remeasure=False)
    mf = MeanFlow(flow=sim.flow, uu_stats=True)
    mf.update(sim.flow)
    f = str(tmp_path / "ckpt.npz")
    save_state(f, sim, meanflow=mf)

    sim2 = make_sim(D)
    mf2 = MeanFlow(flow=sim2.flow, uu_stats=True)
    load_state(f, sim2, meanflow=mf2)
    assert np.allclose(np.array(sim2.flow.u), np.array(sim.flow.u))
    assert np.allclose(np.array(sim2.flow.p), np.array(sim.flow.p))
    assert sim2.flow.dt == sim.flow.dt
    assert np.allclose(np.array(mf2.U), np.array(mf.U))
    assert np.allclose(np.array(mf2.UU), np.array(mf.UU))
    assert mf2.t == mf.t
    # stepping continues
    sim2.sim_step(remeasure=False)
    assert np.all(np.isfinite(np.array(sim2.flow.u)))


def test_size_mismatch_raises(tmp_path):
    sim = make_sim(2)
    f = str(tmp_path / "ckpt.npz")
    save_state(f, sim)
    other = Simulation((8, 8), (1.0, 0.0), 4.0, dtype=F32)
    with pytest.raises(ValueError):
        load_state(f, other)


@pytest.mark.parametrize("D", [2, 3])
def test_vtk_roundtrip(tmp_path, D):
    os.chdir(tmp_path)
    sim = make_sim(D)
    writer = VTKWriter("wl")
    writer.write(sim)
    sim.sim_step(remeasure=False)
    writer.write(sim)
    sim.sim_step(remeasure=False)
    writer.write(sim)
    writer.close()

    sim2 = make_sim(D)
    sim2, writer2 = load_vtk(sim2, "wl.pvd")
    assert np.allclose(np.array(sim2.flow.u), np.array(sim.flow.u), atol=1e-6)
    assert np.allclose(np.array(sim2.flow.p), np.array(sim.flow.p), atol=1e-6)
    # time restored from the collection timestamps
    assert sim2.time == pytest.approx(sim.time, abs=1e-6)
    # append-mode writer continues the collection
    sim2.sim_step(remeasure=False)
    writer2.write(sim2)
    assert writer2.count == 4


def test_solver_logger(tmp_path):
    os.chdir(tmp_path)
    sim = make_sim(2)
    lg = SolverLogger("WaterLily")
    sim.sim_step(remeasure=False)
    lg.log_step(sim)
    sim.sim_step(remeasure=False)
    lg.log_step(sim)
    counts, rinf, r1 = parse_log("WaterLily.log")
    assert len(counts) == 4  # 2 steps x (predictor + corrector)
    assert all(len(a) == c + 1 for a, c in zip(rinf, counts))
    # converged residuals decrease below tolerance when iterations ran
    for c, a in zip(counts, rinf):
        if c > 0:
            assert a[-1] < 2e-3


def test_orbax_roundtrip(tmp_path):
    from waterlily_tpu.utils.io import load_orbax, save_orbax

    sim = make_sim(2)
    sim.sim_step(0.2, remeasure=False)
    mf = MeanFlow(flow=sim.flow, uu_stats=True)
    mf.update(sim.flow)
    f = str(tmp_path / "state.ckpt")
    save_orbax(f, sim, meanflow=mf)

    sim2 = make_sim(2)
    mf2 = MeanFlow(flow=sim2.flow, uu_stats=True)
    load(f, sim2, meanflow=mf2)          # extension dispatch
    assert np.allclose(np.array(sim2.flow.u), np.array(sim.flow.u))
    assert np.allclose(np.array(sim2.flow.p), np.array(sim.flow.p))
    assert sim2.flow.dt == sim.flow.dt
    assert np.allclose(np.array(mf2.UU), np.array(mf.UU))
    sim2.sim_step(remeasure=False)
    assert np.all(np.isfinite(np.array(sim2.flow.u)))


def test_orbax_async(tmp_path):
    from waterlily_tpu.utils.io import load_orbax, save_orbax

    sim = make_sim(2)
    sim.sim_step(remeasure=False)
    f = str(tmp_path / "async.ckpt")
    ck = save_orbax(f, sim, async_=True)
    sim.sim_step(remeasure=False)        # stepping overlaps the write
    ck.wait_until_finished()
    sim2 = make_sim(2)
    load_orbax(f, sim2)
    assert len(sim2.flow.dt) == len(sim.flow.dt) - 1


def test_load_resyncs_flat_engine_mirror():
    """Restoring a checkpoint into a flat-engine sim must reach the flat
    state actually stepped — regression for the load path ignoring
    sim._sync_flat (the restore was silently discarded on TPU)."""
    def mk():
        body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 8.0) ** 2)) - 4.0)
        return Simulation((16, 16, 16), (1.0, 0.0, 0.0), 4.0, nu=0.02,
                          body=body, dtype=F32, engine="flat")

    src = mk()
    src.sim_step(remeasure=False)
    import tempfile
    f = os.path.join(tempfile.mkdtemp(), "s.npz")
    save_state(f, src)
    src.sim_step(remeasure=False)   # reference: one more step from the ckpt

    dst = mk()
    load_state(f, dst)
    dst.sim_step(remeasure=False)
    assert np.allclose(np.array(dst.flow.u), np.array(src.flow.u), atol=2e-6)
