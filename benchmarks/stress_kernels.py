"""Real-TPU stress check: every flat Pallas kernel vs its jnp reference.

The interpret-mode CI tests (`tests/test_pallas_kernels.py`) validate kernel
logic but CANNOT catch Mosaic-only failure modes: interpret-mode `pl.ds`
clamps out-of-range dynamic slices like `lax.dynamic_slice`, while compiled
Mosaic reads out-of-bounds VMEM garbage (this masked the round-1 `div_k`
center-offset bug that silently diverged every benchmark run).  This harness
runs each kernel several times on the actual TPU and checks (a) elementwise
agreement with the jnp flat path and (b) run-to-run determinism — a
nondeterministic kernel is always a memory race.

Usage: python benchmarks/stress_kernels.py [N ...]   (default 32 48 96)
Exit code 1 if any kernel disagrees or is nondeterministic.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

from waterlily_tpu.models import flow as fl
from waterlily_tpu.models import flowflat as ff
from waterlily_tpu.ops import flat as fo
from waterlily_tpu.ops import pallas_flat as plf


def _jnp(fn, *a, **kw):
    """Run the jnp flat reference implementation (Pallas gated off)."""
    plf._IN_LOOP = True
    try:
        return fn(*a, **kw)
    finally:
        plf._IN_LOOP = False


def _cfl_field(u, g):
    """The pre-reduction CFL summand field (`cfl_flat` without the max)."""
    import jax.numpy as jnp
    s = jnp.zeros(u.shape[1:], u.dtype)
    for i, st in ((0, None), (1, g.Nz), (2, 1)):
        up = fo.xshift(u[i], 1) if st is None else fo.fshift(u[i], st)
        s = s + jnp.maximum(0.0, up) + jnp.maximum(0.0, -u[i])
    return fo.zero_ghost_flat(s, g)


def stress(N: int, reps: int = 6) -> int:
    g = fo.geom_of((N + 2, N + 2, N + 2))
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    mk3 = lambda k: fo.to_flat(
        jax.random.normal(k, (3, g.Nx, g.Ny, g.Nz), jnp.float32), g)
    mk1 = lambda k: fo.to_flat(
        jax.random.normal(k, (g.Nx, g.Ny, g.Nz), jnp.float32), g)
    u = mk3(ks[0])
    # solver-invariant fields: masked r/eps/iD like production (`residual_flat`)
    x = mk1(ks[1])
    r = fo.zero_ghost_flat(mk1(ks[2]), g)
    L = fo.zero_ghost_flat(jnp.abs(mk3(ks[3])), g)
    V = 0.1 * mk3(ks[4])
    mu0 = jnp.abs(mk3(ks[5]))
    mu1 = fo.to_flat(0.1 * jax.random.normal(
        ks[6], (3, 3, g.Nx, g.Ny, g.Nz), jnp.float32), g)
    eps = fo.zero_ghost_flat(mk1(ks[7]), g)
    D, iD = fo.set_diag_flat(L, g)
    nu, dt, om = jnp.float32(0.1), jnp.float32(0.2), jnp.float32(0.8)
    colors = [(1 - 3 - k0) % 2 for k0 in range(1, 5)]

    # band-conforming moments: outside x rows [lo, hi) the fields equal the
    # measure-time far field (μ1 = 0, V = 0, μ0 = bc_vector(ones, zeros))
    lo, hi = max(2, N // 4), min(N, 3 * N // 4)
    inb = ((jnp.arange(g.Nx) >= lo) & (jnp.arange(g.Nx) < hi)
           ).astype(jnp.float32)[:, None, None]
    mu0_far = _jnp(fo.bc_vector_flat, jnp.ones_like(u), (0.0, 0.0, 0.0), g)
    mu0_b = mu0_far + (mu0 - mu0_far) * inb
    mu1_b = mu1 * inb
    V_b = V * inb

    u0f = mk3(ks[8])

    def cheap_ref(kb, sc):
        # band-exterior half-step reference: `bdim_band` with an empty band
        # is the pure-jnp far-field update; then `scale_u!`
        f = _jnp(ff.conv_diff_flat, u, fl.quick, nu, g)
        pre = u if kb else _jnp(ff._scale_interior_flat, u, 0.0, g)
        ch = plf.bdim_band(pre, u0f, f, 0.0 * V, 0.0 * mu0, 0.0 * mu1, dt,
                           g, (1, 1))
        if sc != 1.0:
            ch = _jnp(ff._scale_interior_flat, ch, sc, g)
        return ch, f

    cases = {
        "conv_diff_k": (lambda: plf.conv_diff_k(u, nu, fl.quick, g),
                        lambda: _jnp(ff.conv_diff_flat, u, fl.quick, nu, g)),
        "conv_cheap_p": (lambda: plf.conv_diff_k(u, nu, fl.quick, g,
                                                 cheap=(u0f, dt, 0.0, 1.0)),
                         lambda: cheap_ref(0.0, 1.0)),
        "conv_cheap_c": (lambda: plf.conv_diff_k(u, nu, fl.quick, g,
                                                 cheap=(u0f, dt, 1.0, 0.5)),
                         lambda: cheap_ref(1.0, 0.5)),
        "gs_incr(3)": (lambda: plf.gs_incr(x, r, L, D, iD, colors[:3], om, g),
                       lambda: _jnp(fo.gauss_seidel_rb_flat, L, D, iD, x, r,
                                    g, 3, om)),
        "bdim_k": (lambda: plf.bdim_k(u, u, u, V, mu0, mu1, dt, g),
                   lambda: _jnp(ff.bdim_flat, u, u, u, V, mu0, mu1, dt, g)),
        "bdim_band": (lambda: plf.bdim_band(u, u, u, V_b, mu0_b, mu1_b, dt,
                                            g, (lo, hi)),
                      lambda: _jnp(ff.bdim_flat, u, u, u, V_b, mu0_b, mu1_b,
                                   dt, g)),
        "div_k": (lambda: plf.div_k(u, g), lambda: _jnp(fo.div_flat, u, g)),
        "mult_k": (lambda: plf.mult_k(x, L, D, g),
                   lambda: _jnp(fo.mult_flat, L, D, x, g)),
        "jacobi_incr": (lambda: plf.jacobi_incr(x, r, L, D, iD, om, g),
                        lambda: _jnp(fo.jacobi_flat, L, D, iD, x, r, g, 1, om)),
        "gs_incr(4)": (lambda: plf.gs_incr(x, r, L, D, iD, colors, om, g),
                       lambda: _jnp(fo.gauss_seidel_rb_flat, L, D, iD, x, r,
                                    g, 4, om)),
        "increment_k": (lambda: plf.increment_k(x, r, eps, L, D, om, g),
                        lambda: _jnp(fo.increment_flat, L, D, x, r, eps, om, g)),
        "incr_gs(3)": (lambda: plf.incr_gs(x, r, eps, L, D, iD, colors[:3],
                                           om, g),
                       lambda: _jnp(lambda: fo.gauss_seidel_rb_flat(
                           L, D, iD, *fo.increment_flat(L, D, x, r, eps, om,
                                                        g), g, 3, om))),
        "bc_k": (lambda: plf.bc_k(u, (1.0, 0.0, 0.0), g, False),
                 lambda: _jnp(fo.bc_vector_flat, u, (1.0, 0.0, 0.0), g, False)),
        "bc_div_k": (lambda: plf.bc_div_k(u, (1.0, 0.0, 0.0), g, False),
                     lambda: (lambda ub: (ub, _jnp(fo.div_flat, ub, g)))(
                         _jnp(fo.bc_vector_flat, u, (1.0, 0.0, 0.0), g,
                              False))),
        "projbc_k": (lambda: plf.projbc_k(u, x, L, (1.0, 0.0, 0.0), g,
                                          False, True),
                     lambda: (lambda un: (un, _jnp(_cfl_field, un, g)))(
                         _jnp(fo.bc_vector_flat,
                              _jnp(fo.proj_correct_flat, u, x, L, g),
                              (1.0, 0.0, 0.0), g, False))),
        # mixed-precision smoothers: agreement at bf16 resolution, but
        # determinism must still be EXACT (any nondeterminism is a race)
        "gs_incr_mp(3)": (lambda: plf.gs_incr(x, r, L, D, iD, colors[:3],
                                              om, g, mp=True),
                          lambda: _jnp(fo.gauss_seidel_rb_flat, L, D, iD, x,
                                       r, g, 3, om), 0.12),
        # wider tol: the cascade quantizes r1 = r − ωA·eps whose range is
        # several × |r| on these random fields (bf16 error is scale-relative;
        # matches the interpret-mode 5%-of-scale gate)
        "incr_gs_mp(3)": (lambda: plf.incr_gs(x, r, eps, L, D, iD,
                                              colors[:3], om, g, mp=True),
                          lambda: _jnp(lambda: fo.gauss_seidel_rb_flat(
                              L, D, iD, *fo.increment_flat(L, D, x, r, eps,
                                                           om, g), g, 3, om)),
                          0.5),
    }
    fails = 0
    for name, case in cases.items():
        kf, rf = case[0], case[1]
        tol = case[2] if len(case) > 2 else 2e-4
        want = jax.tree_util.tree_map(np.asarray, rf())
        outs = [jax.tree_util.tree_map(np.asarray, kf()) for _ in range(reps)]

        def maxdiff(a, b):
            return max(np.max(np.abs(x - y)) for x, y in
                       zip(jax.tree_util.tree_leaves(a),
                           jax.tree_util.tree_leaves(b)))

        worst = max(maxdiff(o, want) for o in outs)
        det = max(maxdiff(outs[i], outs[0]) for i in range(1, reps))
        ok = worst < tol and det == 0.0
        fails += 0 if ok else 1
        print(f"N={N} {name:14s} vs-jnp worst={worst:.3e}  nondet={det:.3e}"
              f"  {'ok' if ok else 'FAIL'}", flush=True)
    return fails


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [32, 48, 96]
    total = sum(stress(N) for N in sizes)
    sys.exit(1 if total else 0)
