"""Per-kernel microbenchmarks for the flat-layout TPU fast path.

Times each hot op of the 256^3 step in isolation (conv_diff, BDIM, the MG
smoothers, matvec, BC) and reports achieved HBM bandwidth vs the analytic
bytes-moved model, so regressions and speed-of-light gaps are attributable
per kernel.  Timing is slope-based like `bench.py` (the tunneled backend's
fixed round-trip is subtracted via a 0-work probe).

Usage: python benchmarks/kernels.py [N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()


def time_op(fn, args, reps, probe_out):
    """Median-of-3 slope timing of `reps` chained applications of jit(fn)."""
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    float(probe_out(out))

    t0 = time.perf_counter()
    float(probe_out(out))
    base = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(reps):
            o = f(*args) if not isinstance(args[0], tuple) else f(*args)
        float(probe_out(o))
        best = min(best, time.perf_counter() - t0 - base)
    return best / reps


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from waterlily_tpu.models import flow as fl
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import pallas_flat as plf

    g = fo.geom_of((N + 2, N + 2, N + 2))
    shape = (g.Nx, g.S, 128)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (3,) + shape, jnp.float32)
    x = jax.random.normal(ks[1], shape, jnp.float32)
    r = jax.random.normal(ks[2], shape, jnp.float32)
    L = jnp.abs(jax.random.normal(ks[3], (3,) + shape, jnp.float32))
    V = jnp.zeros_like(u)
    mu0 = jnp.ones_like(u)
    mu1 = jnp.zeros((3, 3) + shape, jnp.float32)
    D, iD = fo.set_diag_flat(L, g)
    nu = jnp.float32(0.1)
    dt = jnp.float32(0.2)
    om = jnp.float32(0.8)
    cells = N ** 3
    fld = cells * 4  # bytes per scalar field (interior)

    first = lambda o: (o[0] if isinstance(o, (tuple, list)) else o).reshape(-1)[0]

    # NOTE: every device array must be a jit *argument* (closure captures are
    # baked into the HLO as dense constants — hundreds of MB at 256^3, which
    # breaks remote compilation)
    cases = [
        # name, fn, args, bytes moved (analytic: reads + writes, interior)
        ("conv_diff", lambda u: plf.conv_diff_k(u, nu, fl.quick, g), (u,),
         (3 + 3) * fld),
        ("bdim", lambda u, u0, f, V, mu0, mu1:
         plf.bdim_k(u, u0, f, V, mu0, mu1, dt, g),
         (u, u, u, V, mu0, mu1), (3 * 3 + 3 + 3 + 9 + 3) * fld),
        ("jacobi_incr", lambda x, r, L, D, iD:
         plf.jacobi_incr(x, r, L, D, iD, om, g),
         (x, r, L, D, iD), (2 + 3 + 2 + 2) * fld),
        ("gs_incr(4)", lambda x, r, L, D, iD:
         plf.gs_incr(x, r, L, D, iD, [1, 0, 1, 0], om, g),
         (x, r, L, D, iD), (2 + 3 + 2 + 2) * fld),
        ("mult", lambda x, L, D: plf.mult_k(x, L, D, g), (x, L, D),
         (1 + 4 + 1) * fld),
        ("bc_vector", lambda u: fo.bc_vector_flat(u, (1.0, 0.0, 0.0), g),
         (u,), 6 * fld),
        ("divergence", lambda u: fo.div_flat(u, g), (u,), 4 * fld),
        ("cfl", lambda u: fo.cfl_flat(u, nu, g), (u,), 3 * fld),
    ]

    print(f"# N={N}^3, reps={reps}, backend={jax.default_backend()}")
    for name, fn, args, nbytes in cases:
        dt_s = time_op(fn, args, reps, first)
        bw = nbytes / dt_s / 1e9
        print(f"{name:14s} {dt_s*1e3:8.3f} ms   {bw:7.1f} GB/s model-BW   "
              f"{cells/dt_s/1e9:6.2f} Gcell/s")


if __name__ == "__main__":
    main()
