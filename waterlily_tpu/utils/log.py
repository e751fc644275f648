"""Pressure-solver logging.

TPU-native port of the `@log`/`logger` channel (`/root/reference/src/core.jl:4-24`)
and the `plot_logger` parser (`ext/WaterLilyPlotsExt.jl:55-104`).  The reference
emits one line per smoother iteration from inside the solver; our solver runs
entirely on device, so each `mom_step` returns a dense per-iteration stats
buffer (r_inf, r_1, omega) that `SolverLogger.log_step` converts into the same
"p/c, iter, r_inf, r_1, omega" rows — identical observability, one host sync
per step instead of one per iteration.
"""
from __future__ import annotations

import numpy as np

__all__ = ["SolverLogger", "parse_log"]

HEADER = "p/c, iter, r_inf, r_1, omega\n"


class SolverLogger:
    """Collect per-projection residual histories into a WaterLily-style log
    file.  Attach with ``logger.log_step(sim)`` after each `sim_step`."""

    def __init__(self, fname: str = "WaterLily"):
        self.fname = fname if fname.endswith(".log") else fname + ".log"
        with open(self.fname, "w") as f:
            f.write(HEADER)

    def log_step(self, sim):
        """Append the predictor/corrector residual rows of the last step in
        the reference's `WaterLily.log` format (`@log`, `core.jl:4-24`)."""
        if sim.solver_stats is None:
            return
        stats = np.asarray(sim.solver_stats)     # (2, itmx+1, 3 or 2)
        iters = sim.pois_n[-2:]
        with open(self.fname, "a") as f:
            for phase, tag in ((0, "p"), (1, "c")):
                f.write(tag)
                n = iters[phase] if phase < len(iters) else 0
                for k in range(n + 1):
                    row = stats[phase, k]
                    om = row[2] if row.shape[0] > 2 else 1.0
                    f.write(f", {k}, {row[0]}, {row[1]}, {om}\n")


def parse_log(fname: str = "WaterLily.log"):
    """Parse a solver log into per-projection residual arrays (the data that
    `plot_logger` visualizes).  Returns ``(counts, r_inf, r_1)`` lists."""
    counts, rinf, r1 = [], [], []
    cur_inf, cur_1 = [], []
    with open(fname) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("p/c"):
                continue
            if line[0] in "pc":
                if cur_inf:
                    counts.append(len(cur_inf) - 1)
                    rinf.append(np.asarray(cur_inf))
                    r1.append(np.asarray(cur_1))
                cur_inf, cur_1 = [], []
                line = line[1:].lstrip(", ")
                if not line:
                    continue
            parts = [p.strip() for p in line.split(",") if p.strip()]
            if len(parts) >= 3:
                cur_inf.append(float(parts[1]))
                cur_1.append(float(parts[2]))
    if cur_inf:
        counts.append(len(cur_inf) - 1)
        rinf.append(np.asarray(cur_inf))
        r1.append(np.asarray(cur_1))
    return counts, rinf, r1
