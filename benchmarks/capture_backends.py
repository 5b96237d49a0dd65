"""One-window per-backend comparison table → BACKENDS_<round>.json.

Same instrument as the BACKENDS_r03/r04 captures (bench.py two-point
host-loop slopes, one window, one process) but as a script instead of a
hand-run series.  The table is a COMPARISON, not the headline — the
cross-checked headline lives in HONEST_<round> (scan protocol).

Usage: python benchmarks/capture_backends.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import bench  # noqa: E402

ROUND = os.environ.get("CSDR_ROUND", "r05")

BACKENDS = [
    ("cu8_wide", lambda it: bench.run_u8(it, wide=True)),
    ("pallas_wide", lambda it: bench.run("pallas_wide", it)),
    ("pallas_full", lambda it: bench.run("pallas_full", it)),
    ("cu8", lambda it: bench.run_u8(it)),
    ("xla", lambda it: bench.run("xla", it)),
    ("pallas", lambda it: bench.run("pallas", it)),
]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    vals = {}
    for name, fn in BACKENDS:
        try:
            vals[name] = round(fn(iters), 2)
        except Exception as e:  # keep the table even if one backend breaks
            vals[name] = f"failed: {type(e).__name__}"
        print(f"# {name}: {vals[name]}", flush=True)
    best = max((v for v in vals.values() if isinstance(v, float)), default=0.0)
    rec = {
        "healthy": bench.HEALTHY_MSPS <= best <= 25000.0,
        "ts": time.time(),
        "note": "round-5 production; values are bench.py two-point "
                "per-dispatch slopes in ONE window - a comparison table, "
                "not the headline (see HONEST_" + ROUND + ")",
        "msps_per_backend": vals,
    }
    out = os.path.join(HERE, "results", f"BACKENDS_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "backends_best", "value": best,
                      "healthy": rec["healthy"]}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
