"""udf advecting-velocity semantics + SGS forcing — ports of
`/root/reference/test/test_les.jl`."""
import jax.numpy as jnp
import numpy as np

from waterlily_tpu import Simulation
from waterlily_tpu.ops.grid import interior
from waterlily_tpu.utils.les import sgs, smagorinsky

F64 = jnp.float64


def test_udf_advecting_velocity():
    # the udf is called once per phase; the predictor advects with u0 while
    # the in-progress state.u interior is zeroed (reference fix covered by
    # `test_les.jl:10-27`) — verified functionally below
    from waterlily_tpu.models import flow as fl
    from waterlily_tpu.ops import multigrid as mg

    seen = {}

    def rec(f, state, u_adv, t):
        # runs under trace; record via shapes/structure + a functional probe:
        # add 0 * u_adv so the tracer values influence nothing
        seen.setdefault("calls", 0)
        seen["calls"] += 1
        return f

    flow = fl.Flow((16, 16), (1.0, 0.0), dtype=F64)
    levels, masks = mg.make_mg(flow.state.mu0)
    fl.mom_step(flow.cfg, flow.state, levels, masks,
                jnp.asarray(0.25, F64), jnp.asarray(0.0, F64), rec)
    assert seen["calls"] == 2  # predictor + corrector

    # and numerically: the predictor phase advects with u0 — a udf returning
    # f + u_adv must inject the boundary velocity, not zeros
    def inject(f, state, u_adv, t):
        return f + u_adv

    flow2 = fl.Flow((16, 16), (1.0, 0.0), dtype=F64)
    st, _, _, _ = fl.mom_step(flow2.cfg, flow2.state, levels, masks,
                              jnp.asarray(0.25, F64), jnp.asarray(0.0, F64), inject)
    # if the predictor had seen the zeroed field, u would stay ~1 after
    # projection; with u0-advection the injected forcing shifts it measurably
    assert float(jnp.abs(interior(st.u, 2) - 1.0).max()) > 0.05


def test_2arg_style_force_udf():
    # force-only udf (gravity) runs once per phase and keeps the flow finite
    calls = {"n": 0}

    def grav(f, state, u_adv, t, g=0.5):
        calls["n"] += 1
        return f + g

    sim = Simulation((16, 16), (1.0, 0.0), 16, U=1.0, dtype=F64)
    sim.sim_step(udf=grav)
    assert calls["n"] == 2
    assert np.all(np.isfinite(np.array(sim.flow.u)))


def test_sgs_runs_and_dissipates():
    # Smagorinsky SGS on a sheared field stays finite and reduces energy
    def ic(i, x):
        return jnp.where(i == 0, jnp.sin(2 * jnp.pi * x[1] / 16), 0.0)

    sim = Simulation((16, 16), (0.0, 0.0), 16, U=1.0, u0=ic, perdir=(0, 1),
                     dtype=F64)
    ke0 = float(jnp.sum(interior(sim.flow.u, 2) ** 2))
    udf = sgs(smagorinsky(Cs=0.2, delta=1.0))
    for _ in range(5):
        sim.sim_step(udf=udf)
    u = np.array(sim.flow.u)
    assert np.all(np.isfinite(u))
    ke1 = float(np.sum(np.array(interior(sim.flow.u, 2)) ** 2))
    assert ke1 < ke0
