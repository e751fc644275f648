"""Phase-level timing of the flat-engine step on a real simulation state.

Complements `kernels.py` (isolated kernels on random fields) with the phases
as the step actually runs them — real BDIM coefficients, warm-started solver,
converged dt — so the per-step budget is attributable:

    conv_diff      momentum flux kernel (×2 per step)
    bdim           BDIM update kernel (×2 per step)
    pred_corr      the fused alternative to the (conv_diff, bdim) pair
    residual       solve entry residual + norms
    v_cycle        one full V-cycle descent
    gs_fine(k)     fine-level GS-RB sweeps for k = smooth_it and overrides
    solve          full pressure solve from the step's own warm start
    step           the whole mom_step (reference: the sum of the above ×2)

Usage: python benchmarks/step_breakdown.py [N] [reps] [smooth_it]
(smooth_it defaults to the bench's perf config, 3 — the library default 4
needs the recalibrated GS block size at 256³, see `pallas_flat._gs_bx`)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()


def timed(fn, args, reps):
    f = jax.jit(fn)
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    probe = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].reshape(-1)[1])
    float(probe(out))
    t0 = time.perf_counter()
    float(probe(out))
    base = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(reps):
            o = f(*args)
        float(probe(o))
        best = min(best, time.perf_counter() - t0 - base)
    return best / reps


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    smooth_it = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flowflat as ffm
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import mgflat
    from waterlily_tpu.ops import multigrid as mg3
    from waterlily_tpu.ops import pallas_flat as plf

    if jax.default_backend() == "cpu":
        plf._INTERPRET = True

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32, engine="flat",
                     smooth_it=smooth_it)
    cfg = sim.flow.cfg
    g = sim._flat["g"]
    masks = sim.masks
    # settle dt + a realistic warm-started state in ONE dispatch
    sim.sim_step_n(3)
    fmg = sim._flat["fmg"]
    state = sim._flat["state"]
    dt = jnp.asarray(sim.flow.dt[-1], jnp.float32)
    cells = N ** 3
    print(f"# N={N}^3 reps={reps} backend={jax.default_backend()} "
          f"settled dt={float(dt):.3f} iters={sim.pois_n[-2:]}")

    u, p = state.u, state.p
    z = jax.jit(lambda u: fo.div_flat(u, g))(u)
    gc1 = mgflat._level_geoms(g, tuple(masks))[1]  # first coarse level

    cases = [
        ("conv_diff", lambda u, nu: plf.conv_diff_k(u, nu, cfg.scheme, g),
         (u, state.nu)),
        ("bdim", lambda u, u0, f, V, m0, m1:
         plf.bdim_k(u, u0, f, V, m0, m1, dt, g),
         (u, u, u, state.V, state.mu0, state.mu1)),
        ("bdim_band", lambda u, u0, f, V, m0, m1:
         plf.bdim_band(u, u0, f, V, m0, m1, dt, g, cfg.band_x),
         (u, u, u, state.V, state.mu0, state.mu1)),
        ("residual", lambda f, x, z:
         fo.residual_flat(f.L, f.D, f.iD, x, z, g), (fmg.fine, p, z)),
        ("v_cycle", lambda fmg, x, r:
         mgflat._v_cycle_flat(fmg, masks, x, r, jnp.float32(0.8), g,
                              cfg.smooth_it), (fmg, p, z)),
        ("gs_fine(4)", lambda f, x, r:
         fo.gauss_seidel_rb_flat(f.L, f.D, f.iD, x, r, g, it=4,
                                 omega=jnp.float32(0.8)), (fmg.fine, p, z)),
        ("gs_fine(2)", lambda f, x, r:
         fo.gauss_seidel_rb_flat(f.L, f.D, f.iD, x, r, g, it=2,
                                 omega=jnp.float32(0.8)), (fmg.fine, p, z)),
        ("solve", lambda fmg, x, z:
         mgflat.solve_mg_flat(fmg, masks, x, z, g, tol=cfg.tol,
                              itmx=cfg.itmx, smooth_it=cfg.smooth_it),
         (fmg, p * dt, z)),
        # V-cycle sub-phases (fine level) — attribute the solve budget
        ("jacobi_fine", lambda f, x, r:
         fo.jacobi_flat(f.L, f.D, f.iD, x, r, g, it=1, omega=jnp.float32(1.0)),
         (fmg.fine, p, z)),
        ("restrict_t", lambda r:
         fo.to_flat(mg3.restrict(fo.from_flat(r, g), masks[0]), gc1), (z,)),
        ("prolong+inc", lambda f, x, r, xc:
         fo.increment_flat(
             f.L, f.D, x, r,
             fo.to_flat(mg3.prolongate(fo.from_flat(xc, gc1), masks[0]), g),
             jnp.float32(0.8), g),
         (fmg.fine, p, z, jnp.zeros((gc1.Nx, gc1.S, 128), jnp.float32))),
        ("norms", lambda r: fo.norms_flat(r), (z,)),
        ("div+bc+cfl", lambda u: (fo.div_flat(u, g),
                                  fo.bc_vector_flat(u, cfg.ubc, g),
                                  fo.cfl_flat(u, state.nu, g)), (u,)),
        ("bc_div_k", lambda u: plf.bc_div_k(u, cfg.ubc, g), (u,)),
        ("projbc_k", lambda u, x, f:
         plf.projbc_k(u, x, f.L, cfg.ubc, g, save_exit=False, want_cfl=True),
         (u, p, fmg.fine)),
        ("step", lambda state, fmg, dt:
         ffm.mom_step_flat_impl(cfg, state, fmg, masks, g, dt,
                                jnp.float32(0.0)), (state, fmg, dt)),
    ]
    for name, fn, args in cases:
        try:
            dt_s = timed(fn, args, reps)
        except Exception as e:  # pragma: no cover
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:12s} {dt_s * 1e3:8.3f} ms   {cells / dt_s / 1e9:6.2f} "
              "Gcell/s", flush=True)


if __name__ == "__main__":
    main()
