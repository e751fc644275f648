"""Interp / spread / squeeze — port of `/root/reference/test/test_util.jl`
plus the performance-hygiene analog of the reference's allocation suite
(`test/test_alloc.jl`): stepping must not retrace/recompile."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.ops.bc import apply_scalar, apply_vector
from waterlily_tpu.utils.interp import (interp_scalar, interp_vector, spread,
                                        spread_sim, squeeze)

F64 = jnp.float64


def test_interp_vector():
    # faces initialized to their own world coordinate -> interp returns the
    # query point exactly (`test_util.jl:3-6`)
    u = apply_vector(lambda i, x: x[i], 2, (8, 8), F64)
    got = interp_vector(jnp.asarray([2.5, 1.0], F64), u)
    assert np.allclose(np.asarray(got), [2.5, 1.0])
    got = interp_vector(jnp.asarray([3.5, 3.0], F64), u)
    assert np.allclose(np.asarray(got), [3.5, 3.0])
    # clamped outside the domain (`test_util.jl:13`)
    got = interp_vector(jnp.asarray([-1.0, 4.0], F64), u)
    assert np.allclose(np.asarray(got), [-0.5, 4.0])


def test_interp_scalar():
    p = apply_scalar(lambda x: x[0], (8, 8), F64)
    assert float(interp_scalar(jnp.asarray([2.5, 1.0], F64), p)) == pytest.approx(2.5)
    assert float(interp_scalar(jnp.asarray([3.5, 3.0], F64), p)) == pytest.approx(3.5)
    # clamp: far query hits the last valid interpolation cell
    # (`test_util.jl:14`: interp((10,10), 8x8) == 6.0)
    assert float(interp_scalar(jnp.asarray([10.0, 10.0], F64), p)) == pytest.approx(6.0)


def test_spread_arrays():
    key = jax.random.PRNGKey(3)
    src = jax.random.uniform(key, (2, 3), F64)
    out = spread(src, 4, dim=2)
    assert out.shape == (2, 3, 4)
    for k in range(4):
        assert np.allclose(np.asarray(out[:, :, k]), np.asarray(src))
    # vector field: leading component axis preserved (`test_util.jl:21-23`)
    src = jax.random.uniform(key, (2, 3, 2), F64)
    out = spread(src.transpose(2, 0, 1), 4, dim=2, lead=1)
    assert out.shape == (2, 2, 3, 4)  # (comp, nx, ny, n_new)


def test_squeeze():
    a = jnp.zeros((3, 1, 4))
    assert squeeze(a).shape == (3, 4)


def _bodies():
    return AutoBody(lambda x, t: jnp.sqrt((x[0] - 8) ** 2 + (x[1] - 8) ** 2) - 6)


def test_spread_sim():
    # 2D circle sim extruded to a periodic 3D sim (`test_util.jl:27-33`)
    body = _bodies()
    sim2 = Simulation((32, 16), (1.0, 0.0), 1.0, body=body, dtype=F64)
    sim2.flow.state = dataclasses.replace(
        sim2.flow.state,
        p=apply_scalar(lambda x: x[0], sim2.flow.cfg.shape, F64),
        u=apply_vector(lambda i, x: x[i], 2, sim2.flow.cfg.shape, F64))
    body3 = AutoBody(lambda x, t: jnp.sqrt((x[0] - 8) ** 2 + (x[1] - 8) ** 2) - 6)
    sim3 = Simulation((32, 16, 8), (1.0, 0.0, 0.0), 1.0, body=body3,
                      perdir=(2,), dtype=F64)
    spread_sim(sim3, sim2, dim=2)
    u3 = np.asarray(sim3.flow.state.u)
    u2 = np.asarray(sim2.flow.state.u)
    for k in (0, 2, 5, 7):
        assert np.allclose(u3[:2, :, :, k], u2)
    assert np.allclose(u3[2], 0.0)
    p3 = np.asarray(sim3.flow.state.p)
    for k in (0, 2, 5, 7):
        assert np.allclose(p3[:, :, k], np.asarray(sim2.flow.state.p))
    # wrong axis -> in-plane shapes mismatch (`test_util.jl:34`)
    with pytest.raises(ValueError):
        spread_sim(sim3, sim2, dim=0)
    # body mismatch (`test_util.jl:35-36`)
    sim3b = Simulation((32, 16, 8), (1.0, 0.0, 0.0), 1.0,
                       body=AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 8.0) ** 2)) - 6),
                       perdir=(2,), dtype=F64)
    with pytest.raises(ValueError):
        spread_sim(sim3b, sim2, dim=2)


def test_no_retrace_per_step():
    # analog of the reference's zero-allocation hot-loop guarantee
    # (`test/test_alloc.jl:19-29`): after the first step, further steps hit
    # the jit cache — no retraces, no recompiles
    from waterlily_tpu.models import flow as fl

    body = _bodies()
    sim = Simulation((32, 16), (1.0, 0.0), 1.0, nu=0.01, body=body, dtype=F64)
    sim.step_once(remeasure=True)
    n0 = fl.mom_step._cache_size()
    for _ in range(3):
        sim.step_once(remeasure=True)
    assert fl.mom_step._cache_size() == n0, "mom_step retraced during stepping"
