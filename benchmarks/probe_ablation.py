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
# the DC share; the atan2 parts subdivide its 26.1%.  NOTE: requesting a
# dc_* part forces the DENSE solve (the kernels ship the group matrix for
# the hier production default otherwise), so the dc rows attribute the
# dense baseline; hier-vs-dense end-to-end is KERNEL_OPTS' job.
# Entries are (name, skip, opts).  Since the hier solve became the
# production default, the dc_* parts need an explicit DENSE baseline
# (requesting a dc_* skip forces the dense path, so "hier-full minus
# dense-minus-part" would compare across implementations):
#   dc_hier_gain       = t(full_dense) - t(full)        (the flip's win)
#   dc_rowcarry(dense) = t(full_dense) - t(dense w/o rowcarry)
#   dc_md(dense)       = t(full_dense) - t(dense w/o md)
#   atan_*             = t(full) - t(variant)           (hier both sides)
SUB_LADDER = [
    ("full", (), ()),
    ("full_dense", (), ("dc_dense",)),
    ("dc_rowcarry", ("dc_rowcarry",), ()),
    ("dc_md", ("dc_md",), ()),
    ("atan_div", ("atan_div",), ()),
    ("atan_poly", ("atan_poly",), ()),
    ("atan_sel", ("atan_sel",), ()),
    ("atan_rr", ("atan_rr",), ()),
]


def measure(iters: int = 12, tileF: int | None = None, ladder=None):
    """Bracketed ladder: the FULL build is re-measured before every variant
    and each variant's time is normalized by its bracketing full — window
    quality swings mid-ladder otherwise poison every delta (an r03 capture
    recorded a NEGATIVE atan2 share and a 2x-too-fast full during a window
    collapse).  ``window_drift`` = max/min of the full measurements; the
    caller marks the run unhealthy above 1.3."""
    import jax  # noqa: F401  (kernel dispatch)
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.utils import autotune

    nch = 64
    block = bench._BLOCK
    if tileF is None:
        tileF = autotune.lookup("flagship_fused_wide", nch, variant="u8")

    # distinct content per run: byte-identical dispatches are
    # relay-replayable (docs/TPU_BACKEND_NOTES.md) — shared implementation
    fresh_u8 = lambda: bench.fresh_u8_pair(block)

    def slope_of(skip, opts=()):
        step = lambda st, x: flagship_fused_wide_step(
            st, x, nch=nch, tileF=tileF, skip=skip, opts=opts)
        st, y = step(flagship_fused_wide_init(nch), fresh_u8())
        bench._probe_scalar(y)
        return bench._slope_msps(step, lambda: flagship_fused_wide_init(nch),
                                 fresh_u8(), block, iters)

    items = [(e + ((),))[:3] for e in (ladder or LADDER)]  # pad opts
    assert items[0][0] == "full"
    fulls = [slope_of(())]
    print(f"# full[0]      {fulls[0]:9.1f} MSPS", flush=True)
    rows = [{"variant": "full", "skip": [], "msps": round(fulls[0], 1),
             "ns_per_sample": round(1e3 / fulls[0], 4)}]
    for name, skip, opts in items[1:]:
        msps = slope_of(skip, opts)
        f = slope_of(())
        fulls.append(f)
        bracket = 0.5 * (fulls[-2] + fulls[-1])
        # normalize to the first full's window: t_norm = t * (f_bracket/f_0)
        # in time-space  =>  msps_norm = msps * f_0 / bracket
        msps_n = msps * fulls[0] / bracket
        rows.append({"variant": name, "skip": list(skip),
                     "msps_raw": round(msps, 1),
                     "bracket_full_msps": round(bracket, 1),
                     "msps": round(msps_n, 1),
                     "ns_per_sample": round(1e3 / msps_n, 4)})
        print(f"# {name:12s} raw {msps:9.1f} norm {msps_n:9.1f} MSPS "
              f"(bracket full {bracket:9.1f})", flush=True)
    if min(fulls) <= 0:
        # a negative/zero slope means t(4N) <= t(N): the relay faked at
        # least one timing — the whole ladder is invalid
        drift = float("inf")
    else:
        drift = max(fulls) / min(fulls)
    print(f"# window drift across ladder: {drift:.3f}", flush=True)
    return rows, tileF, drift


def measure_scanpaired(rounds: int = 3, inner: int = 256, ladder=None,
                       tileF: int | None = None):
    """Drift-immune ladder: each variant is measured as ADJACENT
    (full, variant) measurements — each measurement a TWO-POINT SLOPE over
    scan dispatches of ``inner`` and ``4*inner`` state-chained kernel steps
    (download-terminated, distinct content per run), so the dispatch/RTT
    intercept cancels exactly (CLAUDE.md rule 6c: HONEST_r04 measured a
    26-29 ms intercept, which a single-dispatch ratio would fold into both
    numerator and denominator and compress every stage share toward zero).
    The variant's cost is the MEDIAN of the per-pair slope-time ratios
    t_variant/t_full.  The host-loop ladder normalizes by bracketing fulls,
    which cannot track windows that swing >1.8x within minutes (two r04
    captures refused themselves at drift 3.43 and 2.50); adjacent pairs are
    seconds apart, so the ratio cancels all but intra-pair drift."""
    import jax
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.utils import autotune

    nch = 64
    block = bench._BLOCK
    if tileF is None:
        tileF = autotune.lookup("flagship_fused_wide", nch, variant="u8")

    fresh_u8 = lambda: bench.fresh_u8_pair(block)

    def runner(skip, opts):
        def chunk_of(n):
            def chunk(state, probe, x):
                def body(carry, _):
                    st, pr = carry
                    st2, y = flagship_fused_wide_step(
                        st, x, nch=nch, tileF=tileF, skip=skip, opts=opts)
                    return (st2, y.reshape(-1)[0] + 0.0 * pr), None
                return jax.lax.scan(body, (state, probe), None, length=n)[0]
            step = jax.jit(chunk, donate_argnums=(0,))
            st, pr = step(flagship_fused_wide_init(nch),
                          bench.fresh_seed(), fresh_u8())
            float(jax.device_get(pr))  # warm + force
            return step

        steps = {n: chunk_of(n) for n in (inner, 4 * inner)}

        def run():
            # two-point slope: the (dispatch + RTT) intercept cancels in
            # t(4N) - t(N); returns the slope-honest MSPS
            ts = {}
            for n, step in steps.items():
                s = flagship_fused_wide_init(nch)
                p, x = bench.fresh_seed(), fresh_u8()
                t0 = time.perf_counter()
                s, p = step(s, p, x)
                float(jax.device_get(p))
                ts[n] = time.perf_counter() - t0
            dt = ts[4 * inner] - ts[inner]
            return 3 * inner * block / dt / 1e6 if dt > 0 else float("nan")
        return run

    items = [(e + ((),))[:3] for e in (ladder or LADDER)]
    assert items[0][0] == "full"
    full_run = runner((), ())
    fulls = []
    rows = []
    for name, skip, opts in items[1:]:
        var_run = runner(tuple(skip), tuple(opts))
        ratios, pair_rows = [], []
        for _ in range(rounds):
            f = full_run()
            v = var_run()
            fulls.append(f)
            ratios.append(f / v)          # = t_variant / t_full
            pair_rows.append({"full_msps": round(f, 1),
                              "variant_msps": round(v, 1),
                              "t_ratio": round(f / v, 4)})
        ratios.sort()
        med = ratios[len(ratios) // 2]
        rows.append({"variant": name, "skip": list(skip),
                     "opts": list(opts), "pairs": pair_rows,
                     "t_ratio_median": round(med, 4)})
        fulls_str = ", ".join("%.0f" % p["full_msps"] for p in pair_rows)
        print(f"# {name:12s} t_variant/t_full median {med:.4f}  "
              f"(fulls {fulls_str})", flush=True)
    full_msps_med = sorted(fulls)[len(fulls) // 2]
    full_ns = 1e3 / full_msps_med
    drift = (max(fulls) / min(fulls)) if min(fulls) > 0 else float("inf")
    # rows -> ladder schema: cumulative t_k = ratio_k * t_full
    out_rows = [{"variant": "full", "skip": [],
                 "msps": round(full_msps_med, 1),
                 "ns_per_sample": round(full_ns, 4)}]
    for r in rows:
        t = r["t_ratio_median"] * full_ns
        out_rows.append({"variant": r["variant"], "skip": r["skip"],
                         "pairs": r["pairs"],
                         "t_ratio_median": r["t_ratio_median"],
                         "msps": round(1e3 / t, 1),
                         "ns_per_sample": round(t, 4)})
    print(f"# full median {full_msps_med:.1f} MSPS; "
          f"cross-ladder drift {drift:.3f} (ratios are pair-local)",
          flush=True)
    return out_rows, tileF, drift


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if len(sys.argv) > 2 and sys.argv[2] == "sub":
        rows, tileF, drift = measure(iters, ladder=SUB_LADDER)
        full_ns = rows[0]["ns_per_sample"]
        by = {r["variant"]: r["ns_per_sample"] for r in rows}
        dense_ns = by.get("full_dense", full_ns)
        parts = [{"part": "dc_hier_gain",
                  "ns_per_sample": round(dense_ns - full_ns, 4),
                  "pct_of_dense_full": round(
                      100.0 * (dense_ns - full_ns) / dense_ns, 1)}]
        for cur in rows[1:]:
            name = cur["variant"]
            if name == "full_dense":
                continue
            base = dense_ns if name.startswith("dc_") else full_ns
            d = base - cur["ns_per_sample"]
            parts.append({"part": name, "baseline": (
                "full_dense" if name.startswith("dc_") else "full"),
                "ns_per_sample": round(d, 4),
                "pct_of_baseline": round(100.0 * d / base, 1)})
        # bracket normalization corrects first-order window drift; the gate
        # rejects only wild swings where even adjacent brackets can't track
        # (this environment oscillates ~1.5x across a 15-min ladder)
        healthy = (bench.HEALTHY_MSPS <= rows[0]["msps"] <= 25000.0
                   and 1.0 <= drift < 1.8)
        rec = {"healthy": healthy, "ts": time.time(), "tileF": tileF,
               "block": bench._BLOCK, "input": "u8_wide",
               "window_drift": round(drift, 3),
               "ladder": rows, "parts": parts}
        out = os.path.join(HERE, "results", f"ABLATION_SUB_{ROUND}.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps({"metric": "ablation_sub_full_msps",
                          "value": rows[0]["msps"], "healthy": healthy}))
        print(f"# wrote {out}")
        return
    mode = sys.argv[2] if len(sys.argv) > 2 else "scanpaired"
    if mode == "hostloop":
        rows, tileF, drift = measure(iters)
    else:
        # DEFAULT since round 4: adjacent scan pairs per variant — the
        # bracketed host-loop ladder refused itself twice at drift 2.5-3.4
        rows, tileF, drift = measure_scanpaired(rounds=max(3, iters // 4))
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
    # upper sanity bound: the honest cross-checked record is ~14 GSPS; a
    # "full" at 75 GSPS (observed once, with a NEGATIVE slope elsewhere in
    # the same ladder) is the relay faking chained timings
    if mode == "hostloop":
        healthy = (bench.HEALTHY_MSPS <= rows[0]["msps"] <= 25000.0
                   and 1.0 <= drift < 1.8)
    else:
        # ratios are pair-local, so cross-ladder drift does not gate.  A
        # skip variant CAN legitimately run slower than full (overlap
        # shadow / schedule change — demod_rest reproducibly measured
        # −1.5% to −6.8% across rounds and instruments), so over-unity
        # medians are RECORDED (see over_unity below), not refused — a
        # 1.05 ceiling here would contradict the record-don't-gate policy
        # stated at the inversion handling.  The gate keeps only physical
        # sanity: a skip variant at >1.5× the full kernel is instrument
        # failure (no observed shadow exceeds 7%), and full must sit in
        # the honest healthy band.
        healthy = (bench.HEALTHY_MSPS <= rows[0]["msps"] <= 25000.0
                   and all(0.0 < r.get("t_ratio_median", 1.0) <= 1.5
                           for r in rows[1:]))
    # cumulative-ladder monotonicity: each successive skip removes a strict
    # superset of work, so t_ratio SHOULD be non-increasing.  Inversions are
    # recorded, not gated on: they reproduce across instruments and rounds
    # (demod_rest measured -1.5% in the r03 host-loop ladder and -6.8% in
    # the r04 scan-paired one) — on a compiled-and-scheduled kernel,
    # removing ops can legitimately slow the schedule (layout changes,
    # overlap shadow: docs/PERF.md §2c), and hiding that behind a refusal
    # would misreport the machine.
    ratios = [r.get("t_ratio_median") for r in rows[1:]
              if r.get("t_ratio_median") is not None]
    inversions = [rows[1 + i + 1]["variant"]
                  for i, (a, b) in enumerate(zip(ratios, ratios[1:]))
                  if b > a + 0.02]
    # skip variants whose median exceeds the FULL kernel (t_ratio > 1):
    # the strongest form of inversion — recorded with the same
    # record-don't-gate policy as ladder_inversions
    over_unity = [{"variant": r["variant"],
                   "t_ratio_median": r["t_ratio_median"]}
                  for r in rows[1:]
                  if r.get("t_ratio_median", 1.0) > 1.0]
    rec = {"healthy": healthy, "ts": time.time(), "tileF": tileF,
           "block": bench._BLOCK, "input": "u8_wide", "mode": mode,
           "window_drift": round(drift, 3),
           "ladder_monotone": not inversions,
           "ladder_inversions": inversions,
           "over_unity": over_unity,
           "ladder": rows, "stages": stages}
    out = os.path.join(HERE, "results", f"ABLATION_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "ablation_full_msps",
                      "value": rows[0]["msps"], "healthy": healthy}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
