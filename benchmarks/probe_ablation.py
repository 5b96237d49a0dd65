"""Per-stage cost attribution for the flagship wide kernel, on real hardware.

PERF.md §2 concludes the flagship is bound by in-kernel VPU element work
(24% of measured HBM bandwidth, 2% of MXU) but says nothing about WHICH
stage.  This probe compiles the production kernel with cumulative stages
statically removed (`flagship_fused_wide_step(..., skip=...)` — the gates
are compiled out, so the full build is bit-identical to production) and
slope-measures each variant with the honest protocol (two-point slope,
state-chained, download-terminated — bench._slope_msps).

The difference between consecutive variants' per-sample times is that
stage's cost; the bare variant (everything skipped) is the IO + layout +
carry floor.  Output: benchmarks/results/ABLATION_r02.json with per-stage
ns/sample and the fraction of total kernel time, plus a health verdict
(full-variant throughput must clear bench.HEALTHY_MSPS for the window to
count).

Usage: python benchmarks/probe_ablation.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import bench  # noqa: E402  (slope protocol + health gate)

ROUND = os.environ.get("CSDR_ROUND", "r03")

# cumulative removal order: each entry names the stage whose cost is the
# delta between this variant and the previous one
LADDER = [
    ("full", ()),
    ("atan2", ("atan2",)),
    ("demod_rest", ("demod",)),
    ("dft", ("demod", "dft")),
    ("fir", ("demod", "dft", "fir")),
    ("nco", ("demod", "dft", "fir", "nco")),
    ("dc", ("demod", "dft", "fir", "nco", "dc")),
]

# sub-stage ladder (round 3): each variant removes ONE sub-stage from the
# full production kernel, so (full - variant) attributes that sub-stage's
# cost directly.  Aims the targeted optimizations: the dense row-carry
# matvec (dc_rowcarry) and the difference-fold matmul (dc_md) subdivide
# ABLATION's 45.7% DC share; the atan2 parts subdivide its 26.1%.
SUB_LADDER = [
    ("full", ()),
    ("dc_rowcarry", ("dc_rowcarry",)),
    ("dc_md", ("dc_md",)),
    ("atan_div", ("atan_div",)),
    ("atan_poly", ("atan_poly",)),
    ("atan_sel", ("atan_sel",)),
    ("atan_rr", ("atan_rr",)),
]


def measure(iters: int = 12, tileF: int | None = None, ladder=None):
    import jax
    import jax.numpy as jnp
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.utils import autotune

    nch = 64
    block = bench._BLOCK
    if tileF is None:
        tileF = autotune.lookup("flagship_fused_wide", nch, variant="u8")

    u8 = (jax.jit(lambda: jnp.full((block,), 137, jnp.uint8))(),
          jax.jit(lambda: jnp.full((block,), 120, jnp.uint8))())

    rows = []
    for name, skip in (ladder or LADDER):
        step = lambda st, x: flagship_fused_wide_step(
            st, x, nch=nch, tileF=tileF, skip=skip)
        st, y = step(flagship_fused_wide_init(nch), u8)  # compile + warm
        bench._probe_scalar(y)
        msps = bench._slope_msps(step, lambda: flagship_fused_wide_init(nch),
                                 u8, block, iters)
        rows.append({"variant": name, "skip": list(skip),
                     "msps": round(msps, 1),
                     "ns_per_sample": round(1e3 / msps, 4)})
        print(f"# {name:12s} {msps:9.1f} MSPS  {1e3/msps:.4f} ns/sample",
              flush=True)
    return rows, tileF


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if len(sys.argv) > 2 and sys.argv[2] == "sub":
        rows, tileF = measure(iters, ladder=SUB_LADDER)
        full_ns = rows[0]["ns_per_sample"]
        parts = []
        for cur in rows[1:]:
            d = full_ns - cur["ns_per_sample"]
            parts.append({"part": cur["variant"],
                          "ns_per_sample": round(d, 4),
                          "pct_of_full": round(100.0 * d / full_ns, 1)})
        healthy = rows[0]["msps"] >= bench.HEALTHY_MSPS
        rec = {"healthy": healthy, "ts": time.time(), "tileF": tileF,
               "block": bench._BLOCK, "input": "u8_wide",
               "ladder": rows, "parts": parts}
        out = os.path.join(HERE, "results", f"ABLATION_SUB_{ROUND}.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps({"metric": "ablation_sub_full_msps",
                          "value": rows[0]["msps"], "healthy": healthy}))
        print(f"# wrote {out}")
        return
    rows, tileF = measure(iters)
    full_ns = rows[0]["ns_per_sample"]
    stages = []
    for prev, cur in zip(rows, rows[1:]):
        d = prev["ns_per_sample"] - cur["ns_per_sample"]
        stages.append({"stage": cur["variant"],
                       "ns_per_sample": round(d, 4),
                       "pct_of_full": round(100.0 * d / full_ns, 1)})
    floor = rows[-1]["ns_per_sample"]
    stages.append({"stage": "io_layout_floor",
                   "ns_per_sample": round(floor, 4),
                   "pct_of_full": round(100.0 * floor / full_ns, 1)})
    healthy = rows[0]["msps"] >= bench.HEALTHY_MSPS
    rec = {"healthy": healthy, "ts": time.time(), "tileF": tileF,
           "block": bench._BLOCK, "input": "u8_wide",
           "ladder": rows, "stages": stages}
    out = os.path.join(HERE, "results", f"ABLATION_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "ablation_full_msps",
                      "value": rows[0]["msps"], "healthy": healthy}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
