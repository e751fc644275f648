"""In-program kernel timing via lax.scan slope — tunnel-proof.

Host-dispatched per-kernel timing on the tunneled backend carries a ~2 ms
round trip PER DISPATCH (measured: 20 dependency-chained 134 MB axpb ops =
2.16 ms/op — enqueue-bound, not execution), so `roofline.py`/`kernels.py`
numbers conflate kernel time with tunnel overhead.  This probe times K
repetitions of a kernel INSIDE one jitted lax.scan (carry-chained, so the
device serializes real executions) and reports the (T(K2)-T(K1))/(K2-K1)
slope — pure device-side time per call, no tunnel term.

Usage: python benchmarks/leanprobe.py [N] [case ...]
Cases: axpb copy conv incr jac vcyc (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache

setup_compile_cache()

PEAK = float(os.environ.get("WLTPU_HBM_GBS", "819"))
K1, K2 = 4, 20


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def scan_slope(fn, x0, extra=()):
    """Device time per fn call: scan-slope between K1 and K2 repetitions.
    ``fn(carry, *extra) -> carry`` must be shape-preserving in carry."""
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
        sync(out)                      # compile + settle
        base = time.perf_counter()
        sync(out)
        base = time.perf_counter() - base
        best = float("inf")
        prev = out
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(prev, *extra)    # chained on previous output: no
            sync(out)                  # short-circuit, no overlap
            best = min(best, time.perf_counter() - t0 - base)
            prev = out
        ts[K] = best
    return (ts[K2] - ts[K1]) / (K2 - K1)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 256
    cases = [a for a in sys.argv[1:] if not a.isdigit()] or None
    from waterlily_tpu.models.flow import quick
    from waterlily_tpu.ops import flat as fo
    from waterlily_tpu.ops import pallas_flat as plf

    g = fo.geom_of((N + 2,) * 3)
    shape = (g.Nx, g.S, 128)
    E = g.Nx * g.S * 128
    F = 4 * E / 1e9
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, shape, jnp.float32) * 1e-3
    print(f"# N={N}^3 padded flat {shape} = {F * 1e3:.1f} MB/field; "
          f"scan-slope K={K1}->{K2}", flush=True)

    def row(name, t, gb):
        print(f"{name:30s} {t * 1e3:8.3f} ms  {gb / t:6.0f} GB/s "
              f"{100 * gb / t / PEAK:5.1f}% of {PEAK:.0f}", flush=True)

    want = lambda c: cases is None or c in cases

    if want("axpb"):
        row("xla axpb (1R+1W)",
            scan_slope(lambda a: a * 1.0000001 + 1e-12, x), 2 * F)

    if want("copy"):
        import jax.experimental.pallas as pl

        def body(win, aux, scalars, ox, cos, bx_):
            return [win[0][pl.ds(cos[0], bx_)] * 1.0000001]

        call = plf._halo_call(body, g.Nx, g.S, n_scalar=0, halos=[0],
                              n_aux=0, n_out=1, bx=8, pipeline=True,
                              cover_all=True)
        row("pallas windowed axpb bx=8",
            scan_slope(lambda a: call([], [a], [])[0], x), 2 * F)

    if want("bspec"):
        # standard BlockSpec-pipelined pallas copy (no manual DMA windows):
        # the gold-standard streaming rate of this chip through pallas
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        for bxb in (8, 32):
            def bker(a_ref, o_ref):
                o_ref[:] = a_ref[:] * 1.0000001

            nb = g.Nx // bxb

            def bcall(a, bxb=bxb, nb=nb):
                return pl.pallas_call(
                    bker,
                    grid=(nb,),
                    in_specs=[pl.BlockSpec((bxb, g.S, 128),
                                           lambda i: (i, 0, 0))],
                    out_specs=pl.BlockSpec((bxb, g.S, 128),
                                           lambda i: (i, 0, 0)),
                    out_shape=jax.ShapeDtypeStruct((nb * bxb, g.S, 128),
                                                   jnp.float32),
                )(a)

            xb = x[:nb * bxb]
            row(f"pallas blockspec axpb bx={bxb}",
                scan_slope(bcall, xb), 2 * F * (nb * bxb) / g.Nx)

    if want("big"):
        # >VMEM working set (558 MB): forces the carry into HBM — the
        # 1-field probes above fit in VMEM (a 70 MB scan carry stays
        # resident: measured 2.2 TB/s, i.e. VMEM bandwidth, not HBM)
        import jax.experimental.pallas as pl

        from jax.experimental.pallas import tpu as pltpu

        R = 8 * g.Nx
        xb8 = jnp.concatenate([x * (1 + 1e-6 * k) for k in range(8)], axis=0)
        bxb = 8
        nb = R // bxb

        def bker(a_ref, o_ref):
            o_ref[:] = a_ref[:] * 1.0000001

        def bcall(a):
            return pl.pallas_call(
                bker,
                grid=(nb,),
                in_specs=[pl.BlockSpec((bxb, g.S, 128), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((bxb, g.S, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((nb * bxb, g.S, 128),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(a)

        xb8 = xb8[:nb * bxb]
        row("pallas blockspec 558MB copy",
            scan_slope(bcall, xb8), 2 * F * (nb * bxb) / g.Nx)
        row("xla axpb 558MB",
            scan_slope(lambda a: a * 1.0000001 + 1e-12, xb8),
            2 * F * (nb * bxb) / g.Nx)

    if want("conv"):
        u = jnp.stack([x, x * 0.5, x * 0.25])
        nu = jnp.asarray(1e-3, jnp.float32)
        row("conv_diff_k (plain)",
            scan_slope(lambda u_: plf.conv_diff_k(u_, nu, quick, g), u),
            6 * F)
        dt = jnp.asarray(0.1, jnp.float32)
        row("conv_diff_k (fused cheap)",
            scan_slope(lambda u_: plf.conv_diff_k(
                u_, nu, quick, g, cheap=(u_, dt, 0.0, 1.0))[0], u),
            12 * F)

    if want("incr") or want("jac"):
        L = jnp.stack([jnp.abs(x) + 0.5] * 3)
        from waterlily_tpu.ops.flat import set_diag_flat
        D, iD = set_diag_flat(L, g)
        om = jnp.asarray(0.8, jnp.float32)
        r0 = x * 1e-3
        if want("jac"):
            for mp in (False, True):
                t = scan_slope(
                    lambda xr, L_, D_, iD_: plf.jacobi_incr(
                        xr[0], xr[1], L_, D_, iD_, om, g, mp=mp),
                    (x, r0), (L, D, iD))
                row(f"jacobi_incr mp={int(mp)}", t,
                    4 * F + 5 * F * (0.5 if mp else 1))
        if want("incr"):
            for mp in (False, True):
                t = scan_slope(
                    lambda xr, L_, D_, iD_: plf.incr_gs(
                        xr[0], xr[1], xr[1], L_, D_, iD_, [0, 1], om, g,
                        mp=mp),
                    (x, r0), (L, D, iD))
                row(f"incr_gs it=2 mp={int(mp)}", t,
                    5 * F + 5 * F * (0.5 if mp else 1))


if __name__ == "__main__":
    main()
