"""Simulation API tests — ports of `/root/reference/test/test_simulation.jl`
and the accelerating-circle validation of `test_flow.jl:161-173`.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu import Simulation, AutoBody
from waterlily_tpu.utils.metrics import pressure_force

F32 = jnp.float32


RADIUS = 8


def circle(x, t):
    return jnp.sqrt(jnp.sum((x - 2 * RADIUS) ** 2)) - RADIUS


def move(x, t):
    return x - jnp.stack([t, jnp.zeros_like(t)])


def accel(x, t):
    return x - jnp.stack([2 * t**2, jnp.zeros_like(t)])


def plate(x, t):
    c = jnp.clip(x[0], -RADIUS + 2, RADIUS - 2)
    return jnp.sqrt(jnp.sum((x - jnp.stack([c, jnp.zeros_like(c)])) ** 2)) - 2


def rotate(x, t):
    s, c = jnp.sin(t / RADIUS + 1), jnp.cos(t / RADIUS + 1)
    y = x - 2 * RADIUS
    return jnp.stack([c * y[0] + s * y[1], -s * y[0] + c * y[1]])


def bend(xy, t):
    x, y = xy[0] - 2 * RADIUS, xy[1] - 2 * RADIUS
    k = 2 * t / RADIUS**2 + 0.2 / RADIUS
    return jnp.stack([x + x**3 * k**2 / 6, y - x**2 * k / 2])


NM = (4 * RADIUS, 4 * RADIUS)
NU = RADIUS / 250


def test_sim_time_and_stepping():
    sim = Simulation(NM, (1.0, 0.0), RADIUS, body=AutoBody(circle), nu=NU, dtype=F32)
    assert sim.sim_time == 0.0
    sim.sim_step(0.1, remeasure=False)
    assert sim.sim_time >= 0.1
    assert sim.sim_time > sum(sim.flow.dt[:-2]) * sim.U / sim.L


@pytest.mark.parametrize("exit_bc", [True, False])
def test_moving_body_exact_translation(exit_bc):
    # body moving with V = U = 1 leaves u == 1 (`test_simulation.jl:20-25`)
    sim = Simulation(NM, (1.0, 0.0), RADIUS, body=AutoBody(circle, move),
                     nu=NU, dtype=F32, exit_bc=exit_bc)
    sim.sim_step()
    u = np.array(sim.flow.u)
    assert np.allclose(u[0, :, RADIUS], 1.0, atol=1e-5)


@pytest.mark.parametrize("exit_bc", [True, False])
def test_accelerating_body(exit_bc):
    sim = Simulation(NM, (0.0, 0.0), RADIUS, U=1, body=AutoBody(circle, accel),
                     nu=NU, dtype=F32, exit_bc=exit_bc)
    sim.sim_step()
    assert len(sim.pois_n) == 2 and all(n < 5 for n in sim.pois_n)
    assert float(jnp.max(sim.flow.u)) > float(jnp.max(sim.flow.V)) > 0


@pytest.mark.parametrize("mapfn,dt_lo,dt_hi", [(rotate, 0.5, 1.0), (bend, 0.8, 1.2)])
def test_deforming_body(mapfn, dt_lo, dt_hi):
    sim = Simulation(NM, (0.0, 0.0), RADIUS, U=1, body=AutoBody(plate, mapfn),
                     nu=NU, dtype=F32)
    sim.sim_step()
    assert len(sim.pois_n) == 2 and all(n < 5 for n in sim.pois_n)
    assert dt_lo < sim.flow.dt[-1] < dt_hi


def test_pcg_solver_injection():
    # the pois_ctor dependency-injection analog (`test_simulation.jl:42-54`)
    sim = Simulation(NM, (1.0, 0.0), RADIUS, body=AutoBody(circle), nu=NU,
                     dtype=F32, psolver="pcg")
    sim.sim_step(0.2, remeasure=False)
    assert np.all(np.isfinite(np.array(sim.flow.u)))


def test_u0_initial_condition():
    ic = lambda i, x: jnp.where(i == 0, 2.0, 0.0)
    sim = Simulation((16, 16), (1.0, 0.0), 16, u0=ic, dtype=F32)
    assert np.allclose(np.array(sim.flow.u)[0, 2:14, 2:14], 2.0)


def test_accelerating_circle_added_mass():
    # impulsively accelerated circle: F/(πL²) = [-1, 0] ± 0.04, slip peak ≈ 2U
    # (`test_flow.jl:161-173`)
    # R=32 like the reference, but an 8R half-domain: preserves all three
    # gates (measured force [-1.029, -0.002], slip 1.938, MG <= 2) at a
    # quarter of the 1024^2 fixture's cells (suite-time budget, VERDICT r2)
    radius, H = 32, 8
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - H * radius) ** 2)) - radius)
    ubc = lambda i, x, t: jnp.where(i == 0, t, jnp.zeros_like(t))
    # smooth_it=4 pins the reference smoother strength the <=2-iteration
    # cap was measured with (`GaussSeidelRB!` it=4; TPU default is 3)
    sim = Simulation((2 * H * radius, 2 * H * radius), ubc, radius, U=1,
                     body=body, dtype=F32, smooth_it=4)
    sim.sim_step()
    force = np.array(pressure_force(sim.flow.state.p, sim.body, sim.time))
    force = force / (np.pi * sim.L**2)
    assert np.allclose(force, [-1, 0], atol=0.04)
    u = np.array(sim.flow.u)
    assert u.max() / u[0, 1, 1] > 1.91   # ≈ 2U potential-flow slip
    for _ in range(3):
        sim.sim_step()
    assert all(n <= 2 for n in sim.pois_n[2:])
    assert not any(np.isnan(sim.pois_n))


def test_semicoarsening_channel():
    # 2D 8:1 channel with 50% blocking circle: MG stays ≤ 10 iterations
    # (`test_poisson.jl:72-82`)
    H = 2**4
    R = H // 4
    ctr = jnp.asarray([4 * H, H // 2], F32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - R)
    sim = Simulation((8 * H, H), (1.0, 0.0), R, nu=R / 100, body=body,
                     dtype=F32, smooth_it=4)
    for _ in range(4):
        sim.sim_step(remeasure=False)
    assert all(n <= 10 for n in sim.pois_n)


def test_semicoarsening_duct():
    # 3D 8:1:1 duct with 50% blocking sphere: MG ≤ 12 (`test_poisson.jl:77-82`)
    H = 2**3
    R = H // 4
    ctr = jnp.asarray([4 * H, H / 2, H / 2], F32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - R)
    sim = Simulation((8 * H, H, H), (1.0, 0.0, 0.0), R, nu=R / 100, body=body,
                     dtype=F32, smooth_it=4)
    for _ in range(4):
        sim.sim_step(remeasure=False)
    assert all(n <= 12 for n in sim.pois_n)


# ----------------------------------------------------- user-callable checks
def test_check_fn_bad_signature():
    # `check_fn` analog (`/root/reference/src/WaterLily.jl:78-84`): wrong
    # arity fails at construction with a readable message, not inside vmap
    with pytest.raises(ValueError, match="ubc must have signature"):
        Simulation(NM, lambda x, t: 1.0, RADIUS, U=1.0)
    with pytest.raises(ValueError, match="g"):
        Simulation(NM, (1.0, 0.0), RADIUS, g=lambda i, x: 0.0)
    with pytest.raises(ValueError, match="u0"):
        Simulation(NM, (1.0, 0.0), RADIUS, u0=lambda i, x, t: 0.0)


def test_check_fn_nonscalar_result():
    with pytest.raises(ValueError, match="scalar"):
        Simulation(NM, lambda i, x, t: x, RADIUS, U=1.0)


def test_check_fn_good_callables_pass():
    sim = Simulation(NM, lambda i, x, t: jnp.where(i == 0, 1.0, 0.0), RADIUS,
                     U=1.0, g=lambda i, x, t: 0.0 * t,
                     u0=lambda i, x: jnp.where(i == 0, 1.0, 0.0))
    sim.sim_step()
    assert np.isfinite(float(jnp.max(sim.flow.u)))


# ------------------------------------------------------- drag parity (C_d)
def test_circle_drag_parity_with_reference():
    """BASELINE north star 2: 2D circle drag parity with the Julia reference.

    Exact config of the reference README example
    (`/root/reference/assets/make_assets.jl`: circle(96, 64; Re=100) — radius
    m/8 = 8, center m/2-1 = 31, L = 2·radius, ν = L/Re), measuring the scaled
    pressure drag  F_x / (0.5·L·U²).  The reference's own history
    (`assets/forces.png`) sits at −1.42 … −1.45 over tU/L ∈ [4, 6]; our
    measured value on this config is −1.434 ± 0.003 (session log, round 2).
    Tolerance ±0.08 covers plot digitization + BDIM/scheme jitter."""
    from waterlily_tpu.utils.metrics import pressure_force

    radius, center = 64 / 8, 64 / 2 - 1
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - center) ** 2)) - radius)
    sim = Simulation((96, 64), (1.0, 0.0), 2 * radius, nu=2 * radius / 100,
                     body=body, dtype=F32)
    cds = []
    t = 4.0
    while t <= 6.0 + 1e-9:
        sim.sim_step(t, remeasure=False)
        f = np.array(pressure_force(sim.flow.state.p, sim.body, sim.time))
        cds.append(f[0] / (0.5 * sim.L))
        t += 0.5
    mean_cd = float(np.mean(cds))
    assert abs(mean_cd - (-1.434)) < 0.08, mean_cd


# ------------------------------------------------------- on-device scan loop
def test_sim_step_n_matches_host_loop():
    """`sim_step_n` (one lax.scan program) must reproduce the host loop
    exactly: same fields, same dt history, same solver iteration counts."""
    F64 = jnp.float64
    ctr = jnp.asarray([12.0, 8.0, 8.0], F64)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - 4.0)
    mk = lambda: Simulation((32, 16, 16), (1.0, 0.0, 0.0), 4.0, nu=0.02,
                            body=body, dtype=F64)
    a, b = mk(), mk()
    for _ in range(3):
        a.sim_step(remeasure=False)
    b.sim_step_n(3)
    assert np.allclose(np.array(a.flow.u), np.array(b.flow.u), atol=1e-13)
    assert np.allclose(a.flow.dt, b.flow.dt, atol=1e-13)
    assert a.flow.pois_n == b.flow.pois_n


def test_sim_step_n_2d_generic_engine():
    sim = Simulation((32, 24), (1.0, 0.0), RADIUS, nu=0.08,
                     body=AutoBody(circle), dtype=F32)
    ref = Simulation((32, 24), (1.0, 0.0), RADIUS, nu=0.08,
                     body=AutoBody(circle), dtype=F32)
    for _ in range(2):
        ref.sim_step(remeasure=False)
    sim.sim_step_n(2)
    assert np.allclose(np.array(ref.flow.u), np.array(sim.flow.u), atol=1e-6)
    assert sim.sim_time == pytest.approx(ref.sim_time)


def test_scan_cache_udf_identity_not_recycled_id():
    """Two distinct udfs must never share a compiled scan — regression for
    the `id(udf)` cache key, which a GC'd udf's recycled id could alias to a
    stale compiled loop (the cache now holds a strong reference and compares
    identity)."""
    import gc
    F64 = jnp.float64

    def mk_udf(c):
        def udf(f, state, u_adv, t):
            return f + c
        return udf

    def run(c_first, c_second):
        sim = Simulation((16, 16), (1.0, 0.0), 16, U=1.0, dtype=F64)
        u1 = mk_udf(c_first)
        sim.sim_step_n(1, udf=u1)
        del u1
        gc.collect()
        u2 = mk_udf(c_second)   # without the fix this often recycles u1's id
        sim.sim_step_n(1, udf=u2)
        return np.array(sim.flow.u)

    changed = run(0.0, 0.4)
    stale = run(0.0, 0.0)
    assert not np.allclose(changed, stale, atol=1e-12), \
        "second udf's forcing was ignored (stale scan cache)"


def test_scan_cache_keys_on_coarse_floor():
    """Two sims differing only in `min_coarse_cells` must not share a compiled
    scan — the MG mask stack is not part of FlowCfg, so the cache key carries
    `self.masks` explicitly (advisor round-3 finding: the floored sim's
    2-mask closure applied to the deep stack raised IndexError, and in the
    reverse order the floor was silently ignored)."""
    F64 = jnp.float64
    mk = lambda floor: Simulation((32, 32), (1.0, 0.0), 16, U=1.0, nu=0.01,
                                  dtype=F64, min_coarse_cells=floor)
    a = mk(64)
    b = mk(0)
    assert len(a.masks) != len(b.masks), "floor did not change the stack depth"
    a.sim_step_n(1)
    b.sim_step_n(1)            # raised IndexError before the key fix
    ref = mk(0)
    ref.sim_step(remeasure=False)
    assert np.allclose(np.array(ref.flow.u), np.array(b.flow.u), atol=1e-13)


def test_sim_step_n_remeasure_matches_host_loop():
    """Scan-fused moving-body driver (`sim_step_n(remeasure=True)`): per
    iteration measure + update_mg + mom_step in one lax.scan — must equal
    the measure-then-step host loop exactly (f64), including the Δt history
    and the final BDIM moments (VERDICT-r3 item 4)."""
    F64 = jnp.float64
    ctr = jnp.asarray([10.0, 8.0, 8.0], F64)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - 4.0,
                    lambda x, t: x - jnp.stack([1.5 * t, 0 * t, 0 * t]))
    mk = lambda: Simulation((32, 16, 16), (1.0, 0.0, 0.0), 4.0, nu=0.02,
                            body=body, dtype=F64)
    a, b = mk(), mk()
    for _ in range(4):
        a.sim_step(remeasure=True)
    b.sim_step_n(4, remeasure=True)
    assert np.allclose(np.array(a.flow.u), np.array(b.flow.u), atol=1e-13)
    assert np.allclose(np.array(a.flow.p), np.array(b.flow.p), atol=1e-12)
    assert np.allclose(np.array(a.flow.state.mu0),
                       np.array(b.flow.state.mu0), atol=1e-13)
    assert np.allclose(a.flow.dt, b.flow.dt, atol=1e-13)
    assert a.pois_n == b.pois_n
