"""Sweep WLTPU_GS_BX for the mp incr_gs tail / gs_incr at N^3 (scan-slope).

The `_gs_bx` VMEM model is f32-based; in mp mode 5 of 8 windows and most
scratches are bf16, so larger blocks fit — less halo recompute for the
VPU-bound cascade.  Usage: python benchmarks/gs_bx_probe.py [N] [bx ...]
(sets WLTPU_GS_BX per run via env BEFORE importing kernels is NOT needed —
_gs_bx reads the env at trace time, so we set it per measurement).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache

setup_compile_cache()

K1, K2 = 4, 20


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def scan_slope(fn, x0, extra=()):
    def runner(K):
        @jax.jit
        def run(c, *e):
            def one(c, _):
                return fn(c, *e), None
            return jax.lax.scan(one, c, None, length=K)[0]
        return run

    ts = {}
    for K in (K1, K2):
        run = runner(K)
        out = run(x0, *extra)
        sync(out)
        base = time.perf_counter()
        sync(out)
        base = time.perf_counter() - base
        best = float("inf")
        prev = out
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(prev, *extra)
            sync(out)
            best = min(best, time.perf_counter() - t0 - base)
            prev = out
        ts[K] = best
    return (ts[K2] - ts[K1]) / (K2 - K1)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bxs = [int(a) for a in sys.argv[2:]] or [8, 10, 12]
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import pallas_flat as plf
    from waterlily_tpu.ops.flat import set_diag_flat

    g = fo.geom_of((N + 2,) * 3)
    shape = (g.Nx, g.S, 128)
    F = 4 * g.Nx * g.S * 128 / 1e9
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, shape, jnp.float32) * 1e-3
    L = jnp.stack([jnp.abs(x) + 0.5] * 3)
    D, iD = set_diag_flat(L, g)
    om = jnp.asarray(0.8, jnp.float32)
    r0 = x * 1e-3
    print(f"# N={N}^3 mp=1 sweep bx={bxs}", flush=True)
    for bx in bxs:
        os.environ["WLTPU_GS_BX"] = str(bx)
        for name, fn in (
            ("incr_gs it=2 mp=1", lambda xr, L_, D_, iD_: plf.incr_gs(
                xr[0], xr[1], xr[1], L_, D_, iD_, [0, 1], om, g, mp=True)),
            ("gs_incr it=2 mp=1", lambda xr, L_, D_, iD_: plf.gs_incr(
                xr[0], xr[1], L_, D_, iD_, [0, 1], om, g, mp=True)),
        ):
            try:
                t = scan_slope(fn, (x, r0), (L, D, iD))
                gb = 5 * F + 5 * F * 0.5
                print(f"bx={bx:2d} {name:22s} {t * 1e3:8.3f} ms "
                      f"{gb / t:6.0f} GB/s", flush=True)
            except Exception as e:
                print(f"bx={bx:2d} {name:22s} FAIL {str(e)[:100]}", flush=True)
    os.environ.pop("WLTPU_GS_BX", None)


if __name__ == "__main__":
    main()
