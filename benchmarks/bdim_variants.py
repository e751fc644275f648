"""BDIM kernel shoot-out — attribution for the step's biggest HBM consumer.

`bdim_k` moves ~24 fields (analytic ≈ 2.2 ms at 256³ on v5e HBM) but
measures 9.5 ms; this times the candidate implementations side by side so
the layout/launch structure can be chosen from data:

  pallas      current `bdim_k` (3 launches, one per component, bx=8)
  pallas-bx   same with a larger row block (fewer grid steps, more VMEM)
  jnp-flat    the plain jnp flat-layout reference path (XLA fusion decides)

Usage: python benchmarks/bdim_variants.py [N] [reps]
Correctness of every variant vs the jnp path is asserted first (1e-5).
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
    probe = lambda o: float(o.reshape(-1)[1])
    probe(out)
    t0 = time.perf_counter()
    probe(out)
    base = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(reps):
            o = f(*args)
        probe(o)
        best = min(best, time.perf_counter() - t0 - base)
    return best / reps


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from waterlily_tpu.models import flowflat as ffm
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import pallas_flat as plf

    if jax.default_backend() == "cpu":   # correctness smoke only
        plf._INTERPRET = True

    g = fo.geom_of((N + 2, N + 2, N + 2))
    shape = (3, g.Nx, g.S, 128)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    u = jax.random.normal(ks[0], shape, jnp.float32)
    u0 = jax.random.normal(ks[1], shape, jnp.float32)
    f = jax.random.normal(ks[2], shape, jnp.float32)
    V = jax.random.normal(ks[3], shape, jnp.float32) * 0.1
    mu0 = jnp.abs(jax.random.normal(ks[4], shape, jnp.float32))
    mu1 = jax.random.normal(ks[5], (3,) + shape, jnp.float32) * 0.1
    dt = jnp.float32(0.2)
    cells = N ** 3

    def jnp_path(u, u0, f, V, mu0, mu1):
        old = plf._IN_LOOP
        plf._IN_LOOP = True
        try:
            return ffm.bdim_flat(u, u0, f, V, mu0, mu1, dt, g)
        finally:
            plf._IN_LOOP = old

    variants = [
        ("pallas-bx8", lambda *a: plf.bdim_k(*a, dt, g)),
        ("pallas-bx4", lambda *a: plf.bdim_k(*a, dt, g, bx=4)),
        ("pallas-bx16", lambda *a: plf.bdim_k(*a, dt, g, bx=16)),
        ("pallas-nopipe", lambda *a: plf.bdim_k(*a, dt, g, pipeline=False)),
        ("jnp-flat", jnp_path),
    ]
    args = (u, u0, f, V, mu0, mu1)

    ref = jax.jit(jnp_path)(*args)
    for name, fn in variants:
        got = jax.jit(fn)(*args)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-4, (name, err)

    print(f"# N={N}^3 reps={reps} backend={jax.default_backend()} "
          f"(analytic 24 passes = {24 * cells * 4 / 819e9 * 1e3:.2f} ms at "
          "819 GB/s)")
    for name, fn in variants:
        dt_s = timed(fn, args, reps)
        print(f"{name:10s} {dt_s * 1e3:8.3f} ms   "
              f"{24 * cells * 4 / dt_s / 1e9:6.1f} GB/s-equiv   "
              f"{cells / dt_s / 1e9:5.2f} Gcell/s")


if __name__ == "__main__":
    main()
