"""Grid-core and boundary-condition tests.

Ports the exact ghost-value checks of `/root/reference/test/test_core.jl`
(translated to 0-based, component-first layout).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.ops import grid
from waterlily_tpu.ops.bc import (apply_scalar, apply_vector, bc_vector, exit_bc,
                                  per_bc)

F32 = jnp.float32


def test_loc_grid():
    # Julia: loc(3,CartesianIndex(3,4,5)) == (3,4,4.5) .- 1.5 (1-based)
    # 0-based cell (2,3,4), face component 2: (1.5, 2.5, 3.0) == (3,4,4.5)-1.5
    g = grid.loc_grid(2, (6, 6, 6), F32)
    assert np.allclose(np.array(g[:, 2, 3, 4]), [1.5, 2.5, 3.0])
    gc = grid.loc_grid(None, (6, 6, 6), F32)
    assert np.allclose(np.array(gc[:, 2, 3, 4]), [1.5, 2.5, 3.5])


def test_interior_and_slabs():
    a = jnp.arange(20.0).reshape(4, 5)
    assert grid.interior(a).shape == (2, 3)
    assert grid.interior(a, buff=0).shape == (4, 5)
    b = grid.set_interior(jnp.zeros((4, 5)), jnp.ones((2, 3)))
    assert float(b.sum()) == 6.0 and float(b[0].sum()) == 0.0
    s = grid.slab(a, 1, -1)
    assert s.shape == (4, 1) and float(s[0, 0]) == 4.0


def test_shift_semantics():
    a = jnp.arange(5.0)
    # shift(a, 0, +1)[i] == a[i+1]
    assert np.allclose(np.array(grid.shift(a, 0, 1))[:-1], np.arange(1.0, 5.0))
    assert np.allclose(np.array(grid.shift(a, 0, -1))[1:], np.arange(0.0, 4.0))


def test_apply_scalar_vector():
    # Julia test: p = zeros(4,5); apply!(x->x[1]+x[2]+3, p); L2(p)==187 over inside
    p = apply_scalar(lambda x: x[0] + x[1] + 3, (4, 5), jnp.float64)
    inner = grid.interior(p)
    assert float(jnp.sum(inner**2)) == pytest.approx(187.0)
    # apply!((i,x)->x[i], u): u[i=0] at (r,c) has x-coord r-1
    u = apply_vector(lambda i, x: x[i], 2, (5, 5), jnp.float64)
    for r in range(3):
        assert np.allclose(np.array(u[0, r, :3]), r - 1.0)


def test_bc_vector_constant():
    # Julia test_core.jl BC! block: normal Dirichlet at slabs 0,1,-1; tangential Neumann copy
    rng = np.random.default_rng(0)
    U = (1.0, 0.5)
    u = jnp.asarray(rng.random((2, 6, 6)), F32)
    u = bc_vector(u, U)
    un = np.array(u)
    assert np.all(un[0, 0, :] == 1.0) and np.all(un[0, 1, :] == 1.0) and np.all(un[0, -1, :] == 1.0)
    assert np.all(un[0, 2:-1, 0] == un[0, 2:-1, 1]) and np.all(un[0, 2:-1, -1] == un[0, 2:-1, -2])
    assert np.all(un[1, :, 0] == 0.5) and np.all(un[1, :, 1] == 0.5) and np.all(un[1, :, -1] == 0.5)
    assert np.all(un[1, 0, 2:-1] == un[1, 1, 2:-1]) and np.all(un[1, -1, 2:-1] == un[1, -2, 2:-1])

    # save_exit keeps the exit plane of component 0
    u = u.at[0, -1, :].set(3.0)
    u = bc_vector(u, U, save_exit=True)
    assert np.all(np.array(u)[0, -1, :] == 3.0)

    # conservative exit: exitBC!(u,u,0) restores plug exit at the interior rows
    u = exit_bc(u, u, 0.0)
    assert np.allclose(np.array(u)[0, -1, 1:-1], 1.0)


def test_bc_vector_function_matches_constant():
    rng = np.random.default_rng(1)
    U = (1.0, 0.5)
    ubc = lambda i, x, t: jnp.where(i == 0, 1.0, 0.5)
    a = jnp.asarray(rng.random((2, 6, 6)), F32)
    ua = bc_vector(a, U)
    ub = bc_vector(a, ubc)
    assert np.allclose(np.array(ua), np.array(ub))


def test_bc_periodic():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((2, 6, 6)), F32)
    u = bc_vector(u, (1.0, 0.5), save_exit=True, perdir=(1,))
    un = np.array(u)
    assert np.all(un[0, :, 0] == un[0, :, -2]) and np.all(un[0, :, -1] == un[0, :, 1])

    s = jnp.asarray(rng.random((6, 6)), F32)
    s = per_bc(s, (0, 1))
    sn = np.array(s)
    assert np.all(sn[0, 1:-1] == sn[-2, 1:-1]) and np.all(sn[1:-1, 0] == sn[1:-1, -2])

    # periodic in x: saveexit has no effect
    u = jnp.asarray(rng.random((2, 6, 6)), F32)
    u = bc_vector(u, (1.0, 0.5), save_exit=True, perdir=(0,))
    un = np.array(u)
    assert np.all(un[:, 0, :] == un[:, -2, :]) and np.all(un[:, -1, :] == un[:, 1, :])
    assert np.all(un[1, :, 0] == 0.5) and np.all(un[1, :, 1] == 0.5) and np.all(un[1, :, -1] == 0.5)


def test_bc_nonuniform_function():
    # Ubc_1(i,x) = i==0 ? x[1] : x[0]: tangential ghosts consistent across the domain
    ubc = lambda i, x, t: jnp.where(i == 0, x[1], x[0])
    v = bc_vector(jnp.zeros((2, 6, 6), F32), ubc)
    vn = np.array(v)
    assert np.allclose(vn[0, 0, 1:-1], vn[0, -1, 1:-1], atol=1e-6)
    assert np.allclose(vn[1, 1:-1, 0], vn[1, 1:-1, -1], atol=1e-6)


def test_bc_3d_function():
    # Ubc_2 from test_core.jl: per-axis trig profiles at the face locations
    def ubc(i, x, t):
        return jnp.where(i == 0, jnp.cos(2 * jnp.pi * x[0] / 8),
               jnp.where(i == 1, jnp.sin(2 * jnp.pi * x[1] / 8),
                         jnp.tan(jnp.pi * x[2] / 16)))
    u = bc_vector(jnp.zeros((3, 8, 8, 8), F32), ubc)
    un = np.array(u)
    assert np.allclose(un[0, 0], np.cos(-np.pi / 4), atol=1e-6)
    assert np.allclose(un[0, 1], 1.0, atol=1e-6)
    assert np.allclose(un[0, -1], np.cos(6 * np.pi / 4), atol=1e-6)
    assert np.allclose(un[1, :, 0], np.sin(-np.pi / 4), atol=1e-6)
    assert np.allclose(un[1, :, 1], 0.0, atol=1e-6)
    assert np.allclose(un[1, :, -1], np.sin(6 * np.pi / 4), atol=1e-6)
    assert np.allclose(un[2, :, :, 0], np.tan(-np.pi / 16), atol=1e-6)
    assert np.allclose(un[2, :, :, 1], 0.0, atol=1e-6)
    assert np.allclose(un[2, :, :, -1], np.tan(6 * np.pi / 16), atol=1e-5)
