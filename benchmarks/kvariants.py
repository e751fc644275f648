"""Per-kernel A/B timing at full size without a Simulation build.

Fields are synthetic (random u, uniform-interior Poisson coefficients), so
absolute times match `step_breakdown.py` but setup is seconds, not the ~30
minutes of a 256^3 Simulation construction — the harness for flag/variant
sweeps (WLTPU_CONV_SHARE, WLTPU_PSHIFT_ROLL, WLTPU_INC_PIPE, WLTPU_GS_BX...).

Usage: python benchmarks/kvariants.py [N] [reps] [case ...]
cases: conv gs3 gs4 jac inc restrict prolong bdim projbc bcdiv (default all)
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
    want = set(sys.argv[3:])
    from waterlily_tpu.models import flow as fl
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import mgflat
    from waterlily_tpu.ops import multigrid as mg3
    from waterlily_tpu.ops import pallas_flat as plf

    if jax.default_backend() == "cpu":
        plf._INTERPRET = True

    shape = (N + 2, N + 2, N + 2)
    g = fo.geom_of(shape)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    u = 0.1 * jax.random.normal(ks[0], (3, g.Nx, g.S, 128), jnp.float32) + 1.0
    p = 0.1 * jax.random.normal(ks[1], (g.Nx, g.S, 128), jnp.float32)
    # uniform-interior coefficients (no body): exactly the far-field L.
    # ONE jitted program for the whole build — the eager form is minutes of
    # per-op dispatch round trips on the tunneled backend
    masks = tuple(mg3.level_shapes(
        shape, min_cells=mg3._MIN_COARSE_CELLS)[1])   # the Simulation stack

    @jax.jit
    def build():
        from waterlily_tpu.ops.bc import bc_vector
        mu0 = bc_vector(jnp.ones((3,) + shape, jnp.float32), (0.0, 0.0, 0.0))
        levels = mg3.update_mg(None, masks, mu0, ())
        return mgflat._flatten_stack(levels, g, masks)

    fmg = build()
    f = fmg.fine
    gc1 = mgflat._level_geoms(g, tuple(masks))[1]
    z = jax.jit(lambda u: fo.div_flat(u, g))(u)
    om = jnp.float32(0.8)
    cells = N ** 3
    print(f"# N={N}^3 reps={reps} MP={os.environ.get('WLTPU_KV_MP')}"
          f" SHARE={os.environ.get('WLTPU_CONV_SHARE')}"
          f" ROLL={os.environ.get('WLTPU_PSHIFT_ROLL')}"
          f" IPIPE={os.environ.get('WLTPU_INC_PIPE')}"
          f" GS_BX={os.environ.get('WLTPU_GS_BX')}", flush=True)

    mp = os.environ.get("WLTPU_KV_MP", "0") == "1"
    # solver arrays travel as jit ARGUMENTS (closure captures are baked into
    # the HLO as constants → remote-compile HTTP 413 at 256^3)
    cases = {
        "conv": (lambda u: plf.conv_diff_k(u, jnp.float32(1e-3), fl.quick, g),
                 (u,)),
        "gs3": (lambda f, x, r: fo.gauss_seidel_rb_flat(
            f.L, f.D, f.iD, x, r, g, it=3, omega=om, mp=mp), (f, p, z)),
        "gs4": (lambda f, x, r: fo.gauss_seidel_rb_flat(
            f.L, f.D, f.iD, x, r, g, it=4, omega=om, mp=mp), (f, p, z)),
        "jac": (lambda f, x, r: fo.jacobi_flat(
            f.L, f.D, f.iD, x, r, g, it=1, omega=jnp.float32(1.0), mp=mp),
            (f, p, z)),
        "inc": (lambda f, x, r, e: fo.increment_flat(f.L, f.D, x, r, e, om, g),
                (f, p, z, z)),
        "restrict": (lambda r: mgflat._restrict_flat(r, g, masks[0], gc1),
                     (z,)),
        "prolong": (lambda xc: mgflat._prolong_flat(xc, gc1, masks[0], g),
                    (jnp.zeros((gc1.Nx, gc1.S, 128), jnp.float32),)),
        "vcycle": (lambda fmg, x, r: mgflat._v_cycle_flat(
            fmg, masks, x, r, om, g, 3, mp=mp), (fmg, p, z)),
        "bdim": (lambda u: plf.bdim_k(u, u, u, u * 0, u * 0 + 1,
                                      jnp.zeros((3,) + u.shape, jnp.float32),
                                      jnp.float32(0.4), g), (u,)),
        "projbc": (lambda f, u, x: plf.projbc_k(u, x, f.L, (1.0, 0.0, 0.0), g,
                                                want_cfl=True), (f, u, p)),
        "bcdiv": (lambda u: plf.bc_div_k(u, (1.0, 0.0, 0.0), g), (u,)),
    }
    for name, (fn, args) in cases.items():
        if want and name not in want:
            continue
        try:
            dt_s = timed(fn, args, reps)
        except Exception as e:  # pragma: no cover
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"{name:10s} {dt_s * 1e3:8.3f} ms   {cells / dt_s / 1e9:6.2f} "
              "Gcell/s", flush=True)


if __name__ == "__main__":
    main()
