"""Per-kernel HBM roofline at the bench config (VERDICT-r3 item 2).

For every hot kernel of the flat-engine step at N^3 (default 256): a
bytes-moved model (ideal: each input field read once, each output written
once, at its DMA dtype — halo re-reads excluded, so achieved/bound can
slightly exceed 1 for heavily-windowed kernels), the measured wall time
(median of reps, scalar-fetch synced — `block_until_ready` is a no-op on the
tunneled backend), the achieved GB/s and the fraction of the chip's HBM
bandwidth (WLTPU_HBM_GBS, default 819 for the v5e tunneled here).

Also prints the step-aggregate minimum-traffic bound: the sum of the ideal
bytes of every pass a settled step performs, divided by peak bandwidth —
the wall the step cannot beat without algorithmic change.

NOTE: every timed callable takes its fields as ARGUMENTS (captured arrays
would be baked into the HLO as constants, which the tunneled backend rejects
at 256^3 sizes).

Usage: python benchmarks/roofline.py [N] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache

PEAK = float(os.environ.get("WLTPU_HBM_GBS", "819"))


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


INNER = int(os.environ.get("WLTPU_ROOFLINE_INNER", "20"))


def timeit(fn, args, reps=5):
    """Median per-call wall time of jit(fn)(*args).

    The tunneled backend adds ~3 ms of dispatch/fetch latency per round
    trip — far more than a sub-ms kernel — so each sample enqueues INNER
    async dispatches and syncs once: wall ≈ INNER·kernel + 1 latency, and
    the residual latency is subtracted via the measured sync cost."""
    jf = jax.jit(fn)
    out = jf(*args)
    sync(out)
    base = time.perf_counter()
    sync(out)
    base = time.perf_counter() - base
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(INNER):
            out = jf(*args)
        sync(out)
        ts.append((time.perf_counter() - t0 - base) / INNER)
    ts.sort()
    return max(1e-9, ts[len(ts) // 2])


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    setup_compile_cache()

    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flowflat as ff
    from waterlily_tpu.ops import mgflat
    from waterlily_tpu.ops import pallas_flat as plf
    from waterlily_tpu.ops import flat as fo

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32)
    sim.sim_step_n(3)   # settle dt + warm-start p: the step row must time
    #                     the SETTLED [1,1]-iteration regime, not a cold
    #                     solve (first run measured 94.5 ms of itmx spin)
    cfg = sim.flow.cfg
    g = sim._flat["g"]
    st = sim._flat["state"]
    fmg = sim._flat["fmg"]
    mp = cfg.mp_smooth
    E = g.Nx * g.S * 128          # flat elements per field (incl. lane pad)
    F = 4 * E / 1e9               # GB per f32 field pass
    Fc = (2 if mp else 4) * E / 1e9   # GB per coefficient pass (bf16 if mp)
    band = cfg.band_x or (1, g.Nx - 1)
    bfrac = (band[1] - band[0] + 2) / g.Nx
    fine = fmg.fine
    u, p = st.u, st.p
    x = p
    r = jax.jit(fo.div_flat, static_argnames=("g",))(u, g=g)
    eps = r
    om = jnp.asarray(1.0, jnp.float32)
    dt = jnp.asarray(sim.flow.dt[-1], jnp.float32)
    colors = [(1 - 3 - k) % 2 for k in range(1, cfg.smooth_it + 1)]
    masks = sim.masks
    geoms = mgflat._level_geoms(g, tuple(masks))

    rows = []

    def row(name, fn, args, gb, note=""):
        ms = timeit(fn, args, reps=reps) * 1e3
        gbs = gb / (ms / 1e3)
        rows.append((name, gb, ms, gbs, gbs / PEAK, note))
        print(f"{name:26s} {gb:7.3f} GB  {ms:7.3f} ms  {gbs:6.0f} GB/s "
              f"{100 * gbs / PEAK:5.1f}%  {note}", flush=True)

    # --- momentum phase kernels
    row("conv_diff_k(cheap)",
        lambda u_, u0_, dt_: plf.conv_diff_k(u_, st.nu, cfg.scheme, g,
                                             cheap=(u0_, dt_, 0.0, 1.0)),
        (u, st.u0, dt), 12 * F, "in u,u0 out u',f")
    sl = slice(max(0, band[0] - 1), min(g.Nx, band[1] + 1))
    gs_ = fo.geom_of((band[1] - band[0] + 2, cfg.shape[1], cfg.shape[2]))
    row("bdim_k(band slab)",
        lambda a, b, c, d, e, f_, dt_: plf.bdim_k(a, b, c, d, e, f_, dt_, gs_),
        (u[:, sl], st.u0[:, sl], st.u0[:, sl], st.V[:, sl], st.mu0[:, sl],
         st.mu1[:, :, sl], dt),
        27 * F * bfrac, f"27 slab passes ({100 * bfrac:.0f}% rows)")
    row("bc_div_k", lambda u_: plf.bc_div_k(u_, cfg.ubc, g), (u,), 7 * F,
        "in u out u,div")
    row("projbc_k(cfl)",
        lambda u_, x_, L: plf.projbc_k(u_, x_, L, cfg.ubc, g, want_cfl=True),
        (u, x, fine.L), 12 * F, "in u,x,L out u,s")

    # --- solver kernels (fine level)
    row("jacobi_incr(fine)",
        lambda x_, r_, L, D, iD, om_: plf.jacobi_incr(x_, r_, L, D, iD, om_,
                                                      g, mp=mp),
        (x, r, fine.L, fine.D, fine.iD, om), 4 * F + 5 * Fc, "x,r io + coeff")
    row(f"gs_incr(it={len(colors)})",
        lambda x_, r_, L, D, iD, om_: plf.gs_incr(x_, r_, L, D, iD, colors,
                                                  om_, g, mp=mp),
        (x, r, fine.L, fine.D, fine.iD, om), 4 * F + 5 * Fc,
        "same traffic, cascade")
    row(f"incr_gs(tail it={len(colors)})",
        lambda x_, r_, e_, L, D, iD, om_: plf.incr_gs(x_, r_, e_, L, D, iD,
                                                      colors, om_, g, mp=mp),
        (x, r, eps, fine.L, fine.D, fine.iD, om), 5 * F + 5 * Fc, "+eps in")
    row("mult_k", lambda x_, L, D: plf.mult_k(x_, L, D, g),
        (x, fine.L, fine.D), 6 * F, "")
    row("div_k", lambda u_: fo.div_flat(u_, g), (u,), 4 * F, "")
    row("restrict_flat",
        lambda r_: mgflat._restrict_flat(r_, g, masks[0], geoms[1]), (r,),
        F * (1 + 1 / 8), "fine read, /8 write")
    xc0 = jnp.zeros((geoms[1].Nx, geoms[1].S, 128), jnp.float32)
    row("prolong_flat",
        lambda c_: mgflat._prolong_flat(c_, geoms[1], masks[0], g), (xc0,),
        F * (1 + 1 / 8), "")
    row("norms_flat", lambda r_: fo.norms_flat(r_), (r,), F, "r read")

    # --- full V-cycle + step
    vcyc = ((4 * F + 5 * Fc)            # fine jacobi pre-smooth
            + 2.4 * F                   # restrict + prolong + transfers
            + (13 * F + 5 * Fc) / 6)    # mid+tail levels (1/8 + 1/64 scale)
    row("v_cycle(all levels)",
        lambda fmg_, x_, r_, om_: mgflat._v_cycle_flat(
            fmg_, masks, x_, r_, om_, g, cfg.smooth_it, perdir=cfg.perdir,
            mp=mp)[0],
        (fmg, x, r, om), vcyc + 9 * F + 5 * Fc, "incl fine increment")

    def step(st_, fmg_, dt_):
        return ff.mom_step_flat_impl(cfg, st_, fmg_, masks, g, dt_,
                                     jnp.asarray(0.0, jnp.float32))[0].u

    # settled-step ideal traffic (iters [1,1]): 2 phases x (conv 12F +
    # band bdim + bc+div 7F + entry resid 7F + V-cycle + tail incr_gs
    # (5F+5Fc) + 2 norms 2F + gauge 2F) + final projbc 12F
    step_gb = 2 * (12 * F + 27 * F * bfrac + 7 * F + 7 * F + vcyc
                   + (5 * F + 5 * Fc) + 2 * F + 2 * F) + 12 * F
    row("mom_step (settled)", step, (st, fmg, dt), step_gb, "aggregate bound")

    print(f"\npeak {PEAK:.0f} GB/s; step minimum-traffic bound "
          f"{step_gb / PEAK * 1e3:.1f} ms = "
          f"{N**3 / (step_gb / PEAK) / 1e9:.2f} Gcell/s ceiling", flush=True)
    out = {"N": N, "peak_gbs": PEAK,
           "rows": [dict(zip(("kernel", "gb", "ms", "gbs", "frac", "note"),
                             rr)) for rr in rows]}
    fname = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"roofline_{N}.json")
    with open(fname, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {fname}")


if __name__ == "__main__":
    main()
