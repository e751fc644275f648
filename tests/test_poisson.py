"""Poisson + multigrid solver tests.

Ports `/root/reference/test/test_poisson.jl`: exact diagonal fixtures, the
method of manufactured solutions (build soln, z = A·soln via mult, solve,
compare), iteration-count caps, and semi-coarsening structure checks.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.ops import multigrid as mg
from waterlily_tpu.ops import poisson as ps
from waterlily_tpu.ops.bc import bc_vector
from waterlily_tpu.ops.grid import interior, loc_grid

F32 = jnp.float32


def poisson_setup(shape, use_mg, dtype=F32, tol=2e-3):
    """helper.jl `Poisson_setup`: unit coefficients with zeroed boundary
    faces, manufactured solution soln = x-index (1-based)."""
    D = len(shape)
    L = bc_vector(jnp.ones((D,) + shape, dtype), (0.0,) * D)
    x = jnp.zeros(shape, dtype)
    soln = loc_grid(None, shape, dtype)[0] + 1.5 + 1.0  # == 1-based first index
    soln = soln - soln[(1,) * D]
    if use_mg:
        levels, masks = mg.make_mg(L)
        z = ps.mult(levels[0], soln)
        res = mg.solve_mg(levels, masks, x, z, tol=tol)
        x, r, n = res.x, res.r, res.iters
        lev0 = levels[0]
    else:
        lev0 = ps.make_level(L)
        z = ps.mult(lev0, soln)
        x, r, n, _ = ps.solve(lev0, x, z, tol=tol)
        levels = (lev0,)
    x = x - x[(1,) * D]
    err = jnp.sum(interior(x - soln) ** 2) / jnp.sum(interior(soln) ** 2)
    return float(err), levels, int(n), r


def test_poisson_diag_fixture():
    # 5x5 grid: D == exact stencil counts, iD its guarded inverse
    D_expect = np.array([[0, 0, 0, 0, 0],
                         [0, -2, -3, -2, 0],
                         [0, -3, -4, -3, 0],
                         [0, -2, -3, -2, 0],
                         [0, 0, 0, 0, 0]], np.float32)
    L = bc_vector(jnp.ones((2, 5, 5), F32), (0.0, 0.0))
    lev = ps.make_level(L)
    assert np.array_equal(np.array(lev.D), D_expect)
    with np.errstate(divide="ignore"):
        iD_expect = np.where(D_expect == 0, 0, 1 / D_expect)
    assert np.allclose(np.array(lev.iD), iD_expect)


def test_poisson_manufactured_2d_small():
    err, *_ = poisson_setup((5, 5), use_mg=False)
    assert err < 1e-5


def test_poisson_manufactured_2d():
    err, levels, n, r = poisson_setup((2**6 + 2, 2**6 + 2), use_mg=False)
    assert err < 5e-6
    assert n < 340
    assert float(jnp.max(jnp.abs(r))) < 2e-3


def test_poisson_manufactured_3d():
    err, levels, n, r = poisson_setup((2**4 + 2,) * 3, use_mg=False)
    assert err < 1e-6
    assert n < 40


def test_mg_structure():
    # coarsening masks: only even-and->4 dims coarsen
    assert mg.coarsen_mask((18, 18, 6)) == (True, True, True)
    assert mg.coarsen_mask((18, 18, 4)) == (True, True, False)
    assert mg.coarsen_mask((18, 17, 6)) == (True, False, True)
    # too-coarse domains must raise
    with pytest.raises(ValueError):
        mg.level_shapes((15 + 2, 3**4 + 2))


def test_mg_exact_coarse_fixture():
    # 10x10 fine -> 3 levels, coarsest 4x4 with D = -2 in the interior
    err, levels, n, _ = poisson_setup((10, 10), use_mg=True)
    assert len(levels) == 3
    D3 = np.array(levels[2].D)
    assert np.array_equal(D3, np.array([[0, 0, 0, 0], [0, -2, -2, 0],
                                        [0, -2, -2, 0], [0, 0, 0, 0]], np.float32))
    assert err < 1e-5

    # zero two fine face-columns and update!: coarse diag responds exactly
    Lf = levels[0].L.at[0, 4:6, :].set(0.0)
    _, masks = mg.level_shapes((10, 10))
    new_levels = mg.update_mg(levels, masks, Lf)
    D3 = np.array(new_levels[2].D)
    assert np.array_equal(D3, np.array([[0, 0, 0, 0], [0, -1, -1, 0],
                                        [0, -1, -1, 0], [0, 0, 0, 0]], np.float32))


def test_mg_manufactured_2d():
    err, levels, n, r = poisson_setup((2**6 + 2, 2**6 + 2), use_mg=True)
    assert err < 1e-6
    assert n <= 4
    assert float(jnp.max(jnp.abs(r))) < 2e-3


def test_mg_manufactured_3d():
    err, levels, n, r = poisson_setup((2**4 + 2,) * 3, use_mg=True)
    assert err < 1e-6
    assert n <= 3


def test_restrict_prolongate_roundtrip():
    c = (True, True)
    fine = jnp.zeros((10, 10)).at[1:-1, 1:-1].set(1.0)
    rc = mg.restrict(fine, c)
    assert rc.shape == (6, 6)
    assert np.allclose(np.array(interior(rc)), 4.0)  # 4 children each
    pf = mg.prolongate(rc, c)
    assert pf.shape == (10, 10)
    assert np.allclose(np.array(interior(pf)), 4.0)


def test_pcg_matches_reference_guards():
    # zero residual: pcg is a no-op
    L = bc_vector(jnp.ones((2, 8, 8), F32), (0.0, 0.0))
    lev = ps.make_level(L)
    x0 = jnp.zeros((8, 8), F32)
    x, r = ps.pcg(lev, x0, jnp.zeros_like(x0))
    assert float(jnp.abs(x).max()) == 0.0
