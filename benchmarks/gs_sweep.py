"""Sweep the fine-level GS-RB cascade kernel's tuning space at a given N.

The cascade is the costliest kernel of the pressure solve, and its VMEM
footprint (windows + Mosaic register spills) depends on the block size, the
cascade form, and pipelining in ways the `_gs_bx` model cannot predict at
large S — the slice-cascade form register-spills ~62 MB at 256³/bx=12 and
fails to compile.  This sweeps (bx, sliced, pipe) over one kernel instead of
recompiling the full step per variant.

Usage: python benchmarks/gs_sweep.py [N] [it] [reps] [bx:sliced:pipe ...]
(explicit case specs override the built-in priority list)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import pallas_flat as plf

    if jax.default_backend() == "cpu":
        plf._INTERPRET = True

    g = fo.geom_of((N + 2, N + 2, N + 2))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    shape = (g.Nx, g.S, 128)
    x = jax.random.normal(ks[0], shape, jnp.float32)
    r = fo.zero_ghost_flat(jax.random.normal(ks[1], shape, jnp.float32), g)
    L = jnp.abs(jax.random.normal(ks[2], (3,) + shape, jnp.float32))
    D, iD = fo.set_diag_flat(L, g)
    om = jnp.float32(0.8)
    colors = [(1 - 3 - k0) % 2 for k0 in range(1, it + 1)]
    cells = N ** 3
    print(f"# N={N}^3 it={it} reps={reps} S={g.S} "
          f"auto_bx={plf._gs_bx(g.S, it + 1)}", flush=True)

    # priority order (compiles are minutes each at 256³ — best guesses first;
    # kill the run once a clear winner emerges)
    cases = [(6, 1, 0), (8, 1, 0), (4, 1, 0), (6, 0, 0), (12, 0, 0),
             (8, 0, 0), (6, 1, 1), (8, 1, 1), (12, 1, 0), (4, 0, 0),
             (6, 0, 1), (8, 0, 1)]
    if len(sys.argv) > 4:
        cases = [tuple(int(v) for v in spec.split(":"))
                 for spec in sys.argv[4:]]

    probe = jax.jit(lambda o: o[0].reshape(-1)[1] + o[1].reshape(-1)[1])
    for bx, sliced, pipe in cases:
        os.environ["WLTPU_GS_BX"] = str(bx)
        os.environ["WLTPU_GS_SLICED"] = str(sliced)
        os.environ["WLTPU_GS_PIPE"] = str(pipe)
        name = f"bx{bx}{'_full' if not sliced else ''}{'_pipe' if pipe else ''}"
        # L/D/iD must be jit ARGUMENTS: closure captures are baked into the
        # HLO as dense constants and the tunnel rejects big programs
        f = jax.jit(lambda x, r, L, D, iD:
                    plf.gs_incr(x, r, L, D, iD, colors, om, g))
        try:
            t_c = time.perf_counter()
            o = f(x, r, L, D, iD)
            float(probe(o))
            t_c = time.perf_counter() - t_c
            t0 = time.perf_counter()
            float(probe(o))
            base = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                oo = o
                for _ in range(reps):
                    oo = f(oo[0], oo[1], L, D, iD)
                float(probe(oo))
                best = min(best, time.perf_counter() - t0 - base)
            ms = best / reps * 1e3
            print(f"{name:14s} {ms:8.3f} ms  {cells / (ms * 1e-3) / 1e9:6.2f} "
                  f"Gcell/s  (compile {t_c:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
    for k in ("WLTPU_GS_BX", "WLTPU_GS_SLICED", "WLTPU_GS_PIPE"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
