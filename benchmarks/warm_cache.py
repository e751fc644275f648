"""Pre-warm the persistent XLA compile cache with the driver bench programs.

The first 256^3 compile on the tunneled TPU backend takes ~5-10 min — more
than the driver's bench budget can afford at the top rung.  Compiled TPU
executables are cached on disk (`utils.cache.setup_compile_cache`), and
since `strip_mosaic_locations` the cache survives pure code motion — but any
LOGIC change to a traced file still invalidates it, so run this after the
last compute-path commit of a session:

    python benchmarks/warm_cache.py            # full ladder + moving rung
    python benchmarks/warm_cache.py 128 64     # specific sizes only

It simply runs `bench.py`'s one-process upward ladder with a huge budget —
exactly the programs (and cache keys) the driver's run will need.
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sizes = ",".join(sys.argv[1:]) or "64,128,256"
    env = dict(os.environ, WLTPU_BENCH_LADDER=sizes,
               WLTPU_BENCH_BUDGET_S="3600")
    t0 = time.time()
    cp = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                        env=env, capture_output=True, text=True)
    tail = (cp.stdout.strip().splitlines() or [""])[-1]
    print(f"ladder {sizes} (+moving): rc={cp.returncode} "
          f"{time.time() - t0:.0f}s {tail}", flush=True)
    if cp.returncode != 0:
        sys.stderr.write(cp.stderr[-3000:])


if __name__ == "__main__":
    main()
