"""Pallas flat-layout kernels vs the jnp flat reference implementations.

Runs the TPU kernels in Pallas interpret mode (CPU) on small grids so kernel
logic (halo windows, clamped DMAs, ghost-row handling, cascade coloring) is
validated in CI without TPU hardware; numerics must match `ops.flat` /
`models.flowflat` elementwise (f32, tol 1e-5)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waterlily_tpu.models import flow as fl
from waterlily_tpu.models import flowflat as ff
from waterlily_tpu.ops import flat as fo
from waterlily_tpu.ops import pallas_flat as plf

F32 = jnp.float32


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(plf, "_INTERPRET", True)


def _fields(shape3=(12, 10, 7), seed=0):
    g = fo.geom_of(shape3)
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    shape = (g.Nx, g.S, 128)
    mk = lambda k, lead=(): fo.to_flat(
        jax.random.normal(k, lead + shape3, F32), g)
    u = mk(ks[0], (3,))
    x = mk(ks[1])
    r = mk(ks[2])
    L = jnp.abs(mk(ks[3], (3,)))
    D, iD = fo.set_diag_flat(L, g)
    return g, u, x, r, L, D, iD, ks


def test_conv_diff_k():
    g, u, *_ = _fields()
    got = plf.conv_diff_k(u, jnp.float32(0.1), fl.quick, g)
    plf._INTERPRET = False
    want = ff.conv_diff_flat(u, fl.quick, jnp.float32(0.1), g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_conv_cheap_f_rows():
    """Band-guarded f write-back: u_new identical to the unguarded call and
    f exact on the guarded row range (rows outside are undefined)."""
    g, u, *_ = _fields()
    u0 = u + 0.05
    dt = jnp.float32(0.2)
    nu = jnp.float32(0.1)
    full = plf.conv_diff_k(u, nu, fl.quick, g, cheap=(u0, dt, 0.0, 1.0))
    band = plf.conv_diff_k(u, nu, fl.quick, g, cheap=(u0, dt, 0.0, 1.0),
                           f_rows=(4, 9))
    assert np.allclose(np.asarray(band[0]), np.asarray(full[0]), atol=1e-6)
    assert np.allclose(np.asarray(band[1][:, 4:9]),
                       np.asarray(full[1][:, 4:9]), atol=1e-6)


def test_bdim_k():
    g, u, x, r, L, D, iD, ks = _fields()
    u0 = u + 0.1
    f = 0.5 * u
    V = 0.2 * u
    mu0 = jnp.abs(u)
    mu1 = jnp.stack([0.1 * u, 0.2 * u, 0.3 * u], axis=0)
    dt = jnp.float32(0.2)
    got = plf.bdim_k(u, u0, f, V, mu0, mu1, dt, g)
    plf._INTERPRET = False
    want = ff.bdim_flat(u, u0, f, V, mu0, mu1, dt, g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("it", [0, 1, 4])
def test_smoother_k(it):
    g, u, x, r, L, D, iD, ks = _fields()
    # solver invariant: the residual has zero ghosts (`residual_flat`); the
    # kernels re-assert it on their ghost rows while the jnp path passes
    # input ghosts through — parity holds on invariant-respecting inputs
    r = fo.zero_ghost_flat(r, g)
    colors = [(1 - 3 - k0) % 2 for k0 in range(1, it + 1)]
    om = jnp.float32(0.8)
    got = plf.gs_incr(x, r, L, D, iD, colors, om, g)
    plf._INTERPRET = False
    if it == 0:
        want = fo.jacobi_flat(L, D, iD, x, r, g, it=1, omega=0.8)
    else:
        want = fo.gauss_seidel_rb_flat(L, D, iD, x, r, g, it=it, omega=0.8)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got[0]), np.asarray(want[0]), atol=2e-5)
    assert np.allclose(np.asarray(got[1]), np.asarray(want[1]), atol=2e-5)


def test_mult_k():
    g, u, x, r, L, D, iD, ks = _fields()
    got = plf.mult_k(x, L, D, g)
    plf._INTERPRET = False
    want = fo.mult_flat(L, D, x, g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("save_exit", [False, True])
def test_bc_k(save_exit):
    g, u, *_ = _fields()
    ubc = (1.0, 0.25, -0.5)
    got = plf.bc_k(u, ubc, g, save_exit)
    plf._INTERPRET = False
    want = fo.bc_vector_flat(u, ubc, g, save_exit)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_increment_k():
    g, u, x, r, L, D, iD, ks = _fields()
    r = fo.zero_ghost_flat(r, g)
    eps = fo.zero_ghost_flat(0.3 * x + 0.1, g)
    om = jnp.float32(0.7)
    got = plf.increment_k(x, r, eps, L, D, om, g)
    plf._INTERPRET = False
    want = fo.increment_flat(L, D, x, r, eps, om, g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got[0]), np.asarray(want[0]), atol=2e-5)
    assert np.allclose(np.asarray(got[1]), np.asarray(want[1]), atol=2e-5)


def test_div_k():
    g, u, *_ = _fields()
    got = plf.div_k(u, g)
    plf._INTERPRET = False
    want = fo.div_flat(u, g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.parametrize("save_exit", [False, True])
def test_bc_div_k(save_exit):
    # fused BC! + divergence == bc_vector_flat then div_flat
    g, u, *_ = _fields()
    ubc = (1.0, 0.25, -0.5)
    got_u, got_d = plf.bc_div_k(u, ubc, g, save_exit)
    plf._INTERPRET = False
    want_u = fo.bc_vector_flat(u, ubc, g, save_exit)
    want_d = fo.div_flat(want_u, g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got_u), np.asarray(want_u), atol=2e-6)
    assert np.allclose(np.asarray(got_d), np.asarray(want_d), atol=4e-6)


@pytest.mark.parametrize("save_exit,want_cfl",
                         [(False, False), (True, False), (False, True)])
def test_projbc_k(save_exit, want_cfl):
    # fused projection correction + BC! [+ CFL summand] vs the composed ops
    g, u, x, r, L, D, iD, ks = _fields()
    ubc = (1.0, 0.25, -0.5)
    got = plf.projbc_k(u, x, L, ubc, g, save_exit, want_cfl)
    plf._INTERPRET = False
    want_u = fo.bc_vector_flat(fo.proj_correct_flat(u, x, L, g), ubc, g,
                               save_exit)
    plf._INTERPRET = True
    if want_cfl:
        # s is now an (8, 128) in-kernel MAX partial — only max(s) is
        # consumed (the CFL reduction), so compare the maxima
        got_u, got_s = got
        assert got_s.shape == (8, 128)
        plf._INTERPRET = False
        s = jnp.zeros(want_u.shape[1:], want_u.dtype)
        for i, st in ((0, None), (1, g.Nz), (2, 1)):
            up = (fo.xshift(want_u[i], 1) if st is None
                  else fo.fshift(want_u[i], st))
            s = s + jnp.maximum(0.0, up) + jnp.maximum(0.0, -want_u[i])
        want_s = fo.zero_ghost_flat(s, g)
        plf._INTERPRET = True
        # fold the reference field exactly as the kernel folds its partial
        # (interior rows max, then S//8 sublane-group max) and compare the
        # whole (8, 128) partial elementwise — stronger than max-only
        want_f = plf._fold8(jnp.max(want_s[1:-1], axis=0, keepdims=True),
                            "max")
        assert np.allclose(np.asarray(got_s), np.asarray(want_f), atol=4e-6)
    else:
        got_u = got
    assert np.allclose(np.asarray(got_u), np.asarray(want_u), atol=4e-6)


def test_bdim_band():
    # band-sparse BDIM == full BDIM when the moments honor the band premise:
    # outside x rows [lo, hi) the fields equal the measure-time far field
    # (mu1 = 0, V = 0, mu0 = bc_vector(ones, zeros) — the index-1 normal-face
    # planes zeroed)
    g, u, x, r, L, D, iD, ks = _fields()
    lo, hi = 4, 9
    bx = jnp.arange(g.Nx)
    inb = ((bx >= lo) & (bx < hi)).astype(F32)[:, None, None]
    u0 = u + 0.1
    f = 0.5 * u
    V = 0.2 * u * inb
    plf._INTERPRET = False
    mu0_far = fo.bc_vector_flat(jnp.ones_like(u), (0.0, 0.0, 0.0), g)
    plf._INTERPRET = True
    mu0 = mu0_far + (jnp.abs(u) - mu0_far) * inb
    mu1 = jnp.stack([0.1 * u, 0.2 * u, 0.3 * u], axis=0) * inb
    dt = jnp.float32(0.2)
    got = plf.bdim_band(u, u0, f, V, mu0, mu1, dt, g, (lo, hi))
    plf._INTERPRET = False
    want = ff.bdim_flat(u, u0, f, V, mu0, mu1, dt, g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # empty band: far-field formula everywhere
    z3 = jnp.zeros_like(u)
    got = plf.bdim_band(u, u0, f, z3, mu0_far, jnp.zeros_like(mu1), dt, g,
                        (1, 1))
    plf._INTERPRET = False
    want = ff.bdim_flat(u, u0, f, z3, mu0_far, jnp.zeros_like(mu1), dt, g)
    plf._INTERPRET = True
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("it", [0, 1, 4])
def test_smoother_k_mixed_precision(it):
    """The bf16 mixed-precision smoother (`gs_incr(mp=True)`) must track the
    f32 jnp reference to bf16 resolution — same cascade, same coloring, x/r
    still updated in f32."""
    g, u, x, r, L, D, iD, ks = _fields()
    r = fo.zero_ghost_flat(r, g)
    colors = [(1 - 3 - k0) % 2 for k0 in range(1, it + 1)]
    om = jnp.float32(0.8)
    got = plf.gs_incr(x, r, L, D, iD, colors, om, g, mp=True)
    plf._INTERPRET = False
    if it == 0:
        want = fo.jacobi_flat(L, D, iD, x, r, g, it=1, omega=0.8)
    else:
        want = fo.gauss_seidel_rb_flat(L, D, iD, x, r, g, it=it, omega=0.8)
    plf._INTERPRET = True
    scale = float(jnp.abs(want[1]).max())
    # bf16 has an 8-bit mantissa: elementwise agreement to ~2^-7 relative of
    # the field scale (the cascade compounds a few roundings per sweep)
    assert np.allclose(np.asarray(got[0]), np.asarray(want[0]),
                       atol=0.05 * max(1.0, float(jnp.abs(want[0]).max())))
    assert np.allclose(np.asarray(got[1]), np.asarray(want[1]),
                       atol=0.05 * max(1.0, scale))


def test_mp_solve_converges():
    """A full flat MG solve with mp smoothing must still hit the dual-norm
    tolerance (the stop criterion and residual bookkeeping stay f32)."""
    from waterlily_tpu.ops import mgflat
    from waterlily_tpu.ops import multigrid as mg3

    shape3 = (18, 18, 18)
    g = fo.geom_of(shape3)
    from waterlily_tpu.ops.bc import bc_vector
    mu0 = bc_vector(jnp.ones((3,) + shape3, F32), (0.0, 0.0, 0.0))
    masks = tuple(mg3.level_shapes(shape3)[1])
    levels = mg3.update_mg(None, masks, mu0, ())
    fmg = mgflat._flatten_stack(levels, g, masks)
    key = jax.random.PRNGKey(3)
    z = fo.zero_ghost_flat(
        fo.to_flat(jax.random.normal(key, shape3, F32), g), g)
    z = z - fo.interior_mean_flat(z, g) * fo.inside_mask_flat(g, z.shape, F32)
    res = mgflat.solve_mg_flat(fmg, masks, jnp.zeros_like(z), z, g,
                               tol=2e-3, itmx=32, smooth_it=3, mp=True)
    r1, rinf = fo.norms_flat(res.r)
    n = (g.Nx - 2) ** 3
    assert float(rinf) < 2e-3
    assert float(r1) < 2e-4 * n
    assert int(res.iters) < 32


@pytest.mark.parametrize("mp", [False, True])
def test_incr_gs_fused_tail(mp):
    """`incr_gs` (fused fine increment + RB smooth) must equal the
    sequential `increment_flat` → `gauss_seidel_rb_flat` pair — exactly in
    f32, to bf16 resolution with mp."""
    g, u, x, r, L, D, iD, ks = _fields()
    r = fo.zero_ghost_flat(r, g)
    eps = fo.zero_ghost_flat(0.3 * fo.to_flat(
        jax.random.normal(ks[4], (12, 10, 7), F32), g), g)
    om = jnp.float32(0.8)
    colors = [(1 - 3 - k0) % 2 for k0 in range(1, 4)]
    got = plf.incr_gs(x, r, eps, L, D, iD, colors, om, g, mp=mp)
    plf._INTERPRET = False
    x1, r1 = fo.increment_flat(L, D, x, r, eps, om, g)
    want = fo.gauss_seidel_rb_flat(L, D, iD, x1, r1, g, it=3, omega=0.8)
    plf._INTERPRET = True
    tol = 0.05 if mp else 2e-5
    for got_i, want_i in zip(got, want):
        sc = max(1.0, float(jnp.abs(want_i).max()))
        assert np.allclose(np.asarray(got_i), np.asarray(want_i),
                           atol=tol * sc)


@pytest.mark.parametrize("bx", ["5", "12"])
def test_incr_gs_want_norms(monkeypatch, bx):
    """In-kernel (L1, Linf) small-output norms == `norms_flat` of the
    returned residual — including when the clamped last block re-covers
    rows (bx=5 on a 12-row coverage: blocks at ox 1, 6, 8 overlap rows
    8-10, which the fresh-row mask must not double-sum)."""
    monkeypatch.setenv("WLTPU_GS_BX", bx)
    g, u, x, r, L, D, iD, ks = _fields()
    r = fo.zero_ghost_flat(r, g)
    eps = fo.zero_ghost_flat(0.3 * fo.to_flat(
        jax.random.normal(ks[4], (12, 10, 7), F32), g), g)
    om = jnp.float32(0.8)
    colors = [(1 - 3 - k0) % 2 for k0 in range(1, 3)]
    xo, ro, (r1, rinf) = plf.incr_gs(x, r, eps, L, D, iD, colors, om, g,
                                     want_norms=True)
    plf._INTERPRET = False
    want_r1, want_rinf = fo.norms_flat(ro)
    plf._INTERPRET = True
    assert np.isclose(float(r1), float(want_r1), rtol=1e-5)
    assert np.isclose(float(rinf), float(want_rinf), rtol=1e-6)


def test_solve_fused_tail_matches_sequential():
    """The full solve with the fused V-cycle tail equals the sequential
    form bitwise-ish in f32 (same numerics, one fused kernel)."""
    import os

    from waterlily_tpu.ops import mgflat
    from waterlily_tpu.ops import multigrid as mg3
    from waterlily_tpu.ops.bc import bc_vector

    shape3 = (18, 18, 18)
    g = fo.geom_of(shape3)
    mu0 = bc_vector(jnp.ones((3,) + shape3, F32), (0.0, 0.0, 0.0))
    masks = tuple(mg3.level_shapes(shape3)[1])
    levels = mg3.update_mg(None, masks, mu0, ())
    fmg = mgflat._flatten_stack(levels, g, masks)
    z = fo.zero_ghost_flat(
        fo.to_flat(jax.random.normal(jax.random.PRNGKey(7), shape3, F32), g),
        g)
    z = z - fo.interior_mean_flat(z, g) * fo.inside_mask_flat(g, z.shape, F32)

    def solve():
        return mgflat.solve_mg_flat(fmg, masks, jnp.zeros_like(z), z, g,
                                    tol=2e-3, itmx=32, smooth_it=3)

    res_f = solve()
    os.environ["WLTPU_FUSED_TAIL"] = "0"
    try:
        res_s = solve()
    finally:
        os.environ.pop("WLTPU_FUSED_TAIL", None)
    assert int(res_f.iters) == int(res_s.iters)
    assert np.allclose(np.asarray(res_f.x), np.asarray(res_s.x), atol=2e-5)
