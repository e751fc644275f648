"""Pre-warm the persistent XLA compile cache with the driver bench programs.

The first 256^3 compile on the tunneled TPU backend takes ~10 min — far more
than the driver's bench budget.  Compiled TPU executables are cached on disk
(`waterlily_tpu.utils.cache.setup_compile_cache`), but ANY kernel change
invalidates them, so run this after touching the compute path and before a
bench round:

    python benchmarks/warm_cache.py [sizes...]     # default: 256 128

Each size runs `bench.py` in single-rung mode (exactly the program the
driver's ladder executes, including the measurement scan), so the driver's
256^3-first ladder completes in ~2 min instead of timing out.
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [256, 128]
    for N in sizes:
        env = dict(os.environ, WLTPU_BENCH_N=str(N),
                   WLTPU_BENCH_BUDGET_S="3600")
        t0 = time.time()
        cp = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                            env=env, capture_output=True, text=True)
        tail = (cp.stdout.strip().splitlines() or [""])[-1]
        print(f"{N}^3: rc={cp.returncode} {time.time() - t0:.0f}s {tail}",
              flush=True)
        if cp.returncode != 0:
            sys.stderr.write(cp.stderr[-2000:])
    # moving-body rung (bench.py runs it after the static ladder)
    mn = os.environ.get("WLTPU_BENCH_MOVING", "128")
    if mn != "0":
        env = dict(os.environ, WLTPU_BENCH_MOVING_N=mn,
                   WLTPU_BENCH_BUDGET_S="3600")
        env.pop("WLTPU_BENCH_N", None)
        t0 = time.time()
        cp = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                            env=env, capture_output=True, text=True)
        tail = (cp.stdout.strip().splitlines() or [""])[-1]
        print(f"moving {mn}^3: rc={cp.returncode} {time.time() - t0:.0f}s "
              f"{tail}", flush=True)
        if cp.returncode != 0:
            sys.stderr.write(cp.stderr[-2000:])


if __name__ == "__main__":
    main()
