"""Hardware-ceiling probes: raw streaming bandwidth + dispatch overhead.

Answers two questions the per-kernel roofline (`roofline.py`) cannot:

1. What streaming rate does this chip actually achieve through plain XLA
   (fused elementwise, copy) at the flat-layout shapes?  If that's ~the
   319-394 GB/s our best kernels hit, the "% of HBM" column in
   docs/performance.md is measured against an unreachable nominal peak and
   the kernels are already at the practical ceiling.  If XLA streams much
   faster, the manual halo-window DMA structure is leaving bandwidth on the
   table and a restructure pays across every kernel.

2. What does a device-side dispatch cost inside one jitted program (scan of
   a dependency-chained trivial op)?  The settled 256^3 step runs ~30
   kernels; at c ms each that is a hard floor of 30c ms/step.

All timed callables are dependency-CHAINED (y = f(x); x = y) so the
tunneled runtime can neither short-circuit a re-execution nor overlap
samples (docs/performance.md "Measurement integrity").

Usage: python benchmarks/bwprobe.py [N]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache

setup_compile_cache()

PEAK = float(os.environ.get("WLTPU_HBM_GBS", "819"))


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def timeit_chain(fn, x0, inner=20, reps=5):
    """Median per-call time of a shape-preserving fn, dependency-chained."""
    jf = jax.jit(fn)
    x = jf(x0)
    sync(x)
    base = time.perf_counter()
    sync(x)
    base = time.perf_counter() - base
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            x = jf(x)
        sync(x)
        ts.append((time.perf_counter() - t0 - base) / inner)
    ts.sort()
    return max(1e-9, ts[len(ts) // 2])


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import pallas_flat as plf

    g = fo.geom_of((N, N, N))
    shape = (g.Nx, g.S, 128)
    E = g.Nx * g.S * 128
    F = 4 * E / 1e9          # GB per f32 field pass
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, shape, jnp.float32)
    print(f"# N={N}^3 flat shape {shape} = {F * 1e3:.1f} MB/field, "
          f"nominal peak {PEAK:.0f} GB/s")

    def row(name, t, gb):
        print(f"{name:34s} {t * 1e3:8.3f} ms  {gb / t:6.0f} GB/s "
              f"{100 * gb / t / PEAK:5.1f}% of nominal", flush=True)

    # 1. plain XLA fused elementwise: read 1 field, write 1 field
    t = timeit_chain(lambda a: a * 1.0000001 + 1e-12, x)
    row("xla axpb (1R+1W)", t, 2 * F)

    # 1b. same at 4 fields in flight (closer to kernel working sets)
    def multi(a):
        b = a * 1.0000001
        c = a + b
        d = b * c
        return d - 1e-12 * a
    t = timeit_chain(multi, x)
    row("xla 4-op fused (1R+1W)", t, 2 * F)

    # 1c. big array: 8 fields concatenated (defeats any per-op latency)
    xb = jnp.concatenate([x] * 8, axis=0)
    t = timeit_chain(lambda a: a * 1.0000001 + 1e-12, xb)
    row("xla axpb 8x rows (1R+1W)", t, 16 * F)

    # 1d. 3-field stencil-ish combine (reads 3, writes 1) via XLA roll
    def stenc(a):
        return (a + jnp.roll(a, 1, axis=1) + jnp.roll(a, -1, axis=1)) * (1 / 3)
    t = timeit_chain(stenc, x)
    row("xla 3-pt roll stencil (1R+1W)", t, 2 * F)

    # 2. pallas passthrough through the halo-window structure (copy)
    for bx, pipe in ((8, True), (16, True), (32, True), (8, False)):
        def body(win, aux, scalars, ox, cos, bx_):
            return [win[0][pl_ds(cos[0], bx_)]]

        # local import of pl.ds through the kernel module to keep one source
        import jax.experimental.pallas as pl
        pl_ds = pl.ds

        call = plf._halo_call(body, g.Nx, g.S, n_scalar=0, halos=[0],
                              n_aux=0, n_out=1, bx=bx, pipeline=pipe,
                              cover_all=True)
        fn = lambda a, call=call: call([], [a], [])[0]
        t = timeit_chain(fn, x)
        row(f"pallas copy bx={bx} pipe={int(pipe)} (1R+1W)", t, 2 * F)

    # 2b. pallas 6-field passthrough (the gs_incr-shaped DMA set)
    import jax.experimental.pallas as pl

    def body6(win, aux, scalars, ox, cos, bx_):
        return [win[k][pl.ds(cos[k], bx_)] for k in range(6)]

    call6 = plf._halo_call(body6, g.Nx, g.S, n_scalar=0, halos=[0] * 6,
                           n_aux=0, n_out=6, bx=8, pipeline=True,
                           cover_all=True)

    def fn6(a):
        outs = call6([], [a, a, a, a, a, a], [])
        return outs[0]

    t = timeit_chain(fn6, x)
    row("pallas 6R+6W copy bx=8 pipe", t, 12 * F)

    # 3. dispatch overhead: scan of a chained trivial op on a tiny array
    tiny = jnp.ones((8, 8, 128), jnp.float32)

    def tiny_step(c, _):
        return c * 1.0000001 + 1e-12, None

    for n in (100,):
        jf = jax.jit(lambda c: jax.lax.scan(tiny_step, c, None, length=n)[0])
        t = timeit_chain(jf, tiny, inner=5)
        print(f"xla tiny-op scan x{n}: {t * 1e6 / n:8.1f} us/op", flush=True)

    # 3b. pallas tiny kernel dispatch cost inside jit (chained)
    gt = fo.geom_of((8, 8, 8))
    xt = jnp.ones((gt.Nx, gt.S, 128), jnp.float32)

    def bodyt(win, aux, scalars, ox, cos, bx_):
        return [win[0][pl.ds(cos[0], bx_)] * 1.0000001]

    callt = plf._halo_call(bodyt, gt.Nx, gt.S, n_scalar=0, halos=[0],
                           n_aux=0, n_out=1, bx=8, pipeline=False,
                           cover_all=True)

    def chain_t(a):
        for _ in range(20):
            a = callt([], [a], [])[0]
        return a

    t = timeit_chain(jax.jit(chain_t), xt, inner=5)
    print(f"pallas tiny kernel chained x20: {t * 1e6 / 20:8.1f} us/op",
          flush=True)


if __name__ == "__main__":
    main()
