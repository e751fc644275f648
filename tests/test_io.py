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


# -------------------------------------------------- distributed checkpoints
def _mk_dist_pair(tmp_path=None, mesh_shape=(4,)):
    import jax

    from waterlily_tpu.parallel.dist import DistSimulation, make_mesh

    if len(jax.devices()) < max(4, int(np.prod(mesh_shape))):
        pytest.skip("needs the virtual multi-device mesh")
    ctr = jnp.asarray([12.0, 8.0, 8.0], F32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - 4.0)
    mk = lambda: Simulation((32, 16, 16), (1.0, 0.0, 0.0), 4.0, nu=0.02,
                            body=body, dtype=F32)
    return mk, lambda: DistSimulation(mk(), make_mesh(mesh_shape))


@pytest.mark.parametrize("fmt", ["npz", "ckpt"])
def test_dist_checkpoint_roundtrip(tmp_path, fmt):
    """Step 2, save, rebuild, load, step 1 — parity with an uncheckpointed
    3-step run.  Saves must capture the LIVE sharded state (regression:
    `save_*` read the stale pre-stepping `sim.flow.state`)."""
    from waterlily_tpu.utils.io import load, save

    mk, mkd = _mk_dist_pair()
    src = mkd()
    for _ in range(2):
        src.step_once(remeasure=False)
    f = str(tmp_path / f"dist.{fmt}")
    save(f, src)
    src.step_once(remeasure=False)   # reference: one more step from the ckpt

    dst = mkd()
    load(f, dst)
    dst.step_once(remeasure=False)
    assert np.allclose(dst.u, src.u, atol=1e-6)
    assert np.allclose(dst.p, src.p, atol=2e-5)
    assert dst.sim.flow.dt == pytest.approx(src.sim.flow.dt)


def test_dist_checkpoint_to_single_device(tmp_path):
    """A checkpoint written from a DistSimulation restores into a plain
    Simulation (dense layout) and continues identically."""
    from waterlily_tpu.utils.io import load, save

    mk, mkd = _mk_dist_pair()
    src = mkd()
    for _ in range(2):
        src.step_once(remeasure=False)
    f = str(tmp_path / "dist.ckpt")
    save(f, src)
    src.step_once(remeasure=False)

    ref = mk()
    load(f, ref)
    ref.sim_step(remeasure=False)
    assert np.allclose(np.asarray(ref.flow.u), src.u, atol=1e-5)


def test_dist_vtk_writes_live_state(tmp_path):
    """VTKWriter's default attribs must read the stepped (sharded) fields,
    not the stale `sim.flow.state`."""
    os.chdir(tmp_path)
    mk, mkd = _mk_dist_pair()
    d = mkd()
    d.step_once(remeasure=False)
    w = VTKWriter("dwl")
    w.write(d)
    w.close()
    from waterlily_tpu.utils.io import _read_vti

    fields = _read_vti(os.path.join("vtk_data", "dwl_000000.vti"))
    assert np.allclose(fields["Velocity"][:3], d.u, atol=1e-6)
    assert not np.allclose(fields["Velocity"][:3],
                           np.asarray(d.sim.flow.state.u), atol=1e-6)


def test_dist_meanflow_reads_live_state():
    """MeanFlow built from a DistSimulation averages the live sharded state
    (regression: `update` read the stale single-device `flow.state`)."""
    mk, mkd = _mk_dist_pair()
    d = mkd()
    d.step_once(remeasure=False)
    mf = MeanFlow(flow=d, uu_stats=True)
    mf.update(d)
    assert np.allclose(np.asarray(mf.U), np.asarray(d.state.u), atol=1e-7)
    d.step_once(remeasure=False)
    mf.update(d)
    assert np.all(np.isfinite(np.asarray(mf.uu())))
    # blocked-layout shapes match the sharded state, not the dense cfg.shape
    assert mf.P.shape == d.state.p.shape


def test_dist_rejects_unknown_solver():
    """An unknown custom pressure solver must raise under decomposition, not
    be silently replaced by multigrid (`pois_ctor` contract,
    `WaterLily.jl:96-97`).  `psolver='pcg'` itself decomposes since round 4
    (`tests/test_dist.py::test_dist_pcg_solver`); only solvers the
    decomposition layer cannot wire refuse."""
    import jax

    from waterlily_tpu.parallel.dist import DistSimulation, make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    sim = Simulation((32, 16), (1.0, 0.0), 4.0, dtype=F32, psolver="pcg")
    sim.psolver = "custom"     # an injected solver dist cannot decompose
    with pytest.raises(ValueError, match="psolver"):
        DistSimulation(sim, make_mesh((4,)))


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
