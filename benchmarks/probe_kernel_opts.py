"""On-chip A/B for the round-2 kernel optimizations, honest protocol.

ABLATION_r02.json attributed 45.7% of the fused flagship kernel to the DC
blocker and 26.1% to atan2 — neither FLOP-bound, both op-count/latency-bound.
Two targeted changes:

  * stacked DC (`flagship_fused._dc_solve_stacked`): x_re/x_im stacked along
    sublanes so the u8 conversion and every DC pass run once on a doubled
    panel (bit-identical results, half the op dispatches);
  * fast-reciprocal atan2 (`pfb_fused._fast_recip`): bit-trick seed + three
    Newton steps instead of the compiler's correctly-rounded divide
    (audio differs by <= 1 ulp).

This probe measures the production wide kernel (u8 input — the headline
backend) against each experiment enabled via the ``opts`` gate, in one
window.  RECORDED VERDICT (scan-paired, healthy 9.2-9.6 GSPS window):
stacked DC is ~9% SLOWER (the stacked panel materializes a full input copy
before any DC work, defeating Mosaic's per-component software pipelining);
fast-reciprocal atan2 is NEUTRAL (Mosaic's divide already lowers to a
comparable sequence).  Production therefore keeps the per-component DC and
the divide-based atan2; the gates and this probe stay for reproduction.

Usage: python benchmarks/probe_kernel_opts.py [iters]
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

VARIANTS = [
    ("production", ()),
    ("fast_atan", ("fast_atan",)),
    ("dc_stack", ("dc_stack",)),
    ("both_experiments", ("dc_stack", "fast_atan")),
]


def measure(iters: int = 12, tileF: int | None = None):
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
    for name, opts in VARIANTS:
        step = lambda st, x: flagship_fused_wide_step(
            st, x, nch=nch, tileF=tileF, opts=opts)
        st, y = step(flagship_fused_wide_init(nch), u8)  # compile + warm
        bench._probe_scalar(y)
        msps = bench._slope_msps(step, lambda: flagship_fused_wide_init(nch),
                                 u8, block, iters)
        rows.append({"variant": name, "opts": list(opts),
                     "msps": round(msps, 1),
                     "ns_per_sample": round(1e3 / msps, 4)})
        print(f"# {name:16s} {msps:9.1f} MSPS  {1e3/msps:.4f} ns/sample",
              flush=True)
    return rows, tileF


def paired(iters: int = 10, rounds: int = 4, tileF: int | None = None):
    """Alternate production/experiment measurements ROUNDS times and report per-round
    ratios — window drift between sequential runs was observed at ±10%, so a
    single A/B pass cannot attribute a <10% delta; adjacent-in-time pairs
    mostly cancel the drift."""
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

    def runner(opts):
        step = lambda st, x: flagship_fused_wide_step(
            st, x, nch=nch, tileF=tileF, opts=opts)
        st, y = step(flagship_fused_wide_init(nch), u8)
        bench._probe_scalar(y)
        return lambda: bench._slope_msps(
            step, lambda: flagship_fused_wide_init(nch), u8, block, iters)

    base = runner(())
    exp = runner(("dc_stack", "fast_atan"))
    ratios, pairs = [], []
    for r in range(rounds):
        a = base()
        b = exp()
        ratios.append(b / a)
        pairs.append({"production_msps": round(a, 1),
                      "experiment_msps": round(b, 1),
                      "ratio": round(b / a, 4)})
        print(f"# round {r}: production {a:8.1f}  experiment {b:8.1f}  "
              f"ratio {b/a:.4f}", flush=True)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    return pairs, med, tileF


def scan_paired(rounds: int = 3, inner: int = 512, tileF: int | None = None):
    """Strongest instrument for a <10% delta: one dispatch = ``inner``
    state-chained kernel steps inside lax.scan (seconds of device work, so
    relay RTT jitter is <2% of each timed region), download-terminated,
    production/experiment alternated."""
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

    def chunk_for(opts):
        def chunk(state, probe, x):
            def body(carry, _):
                st, pr = carry
                st2, y = flagship_fused_wide_step(st, x, nch=nch, tileF=tileF,
                                                  opts=opts)
                pr2 = y.reshape(-1)[0] + 0.0 * pr
                return (st2, pr2), None
            return jax.lax.scan(body, (state, probe), None, length=inner)[0]
        step = jax.jit(chunk, donate_argnums=(0,))
        st, pr = step(flagship_fused_wide_init(nch), jnp.float32(0.0), u8)
        float(jax.device_get(pr))  # warm + force

        def run():
            s, p = flagship_fused_wide_init(nch), jnp.float32(0.0)
            t0 = time.perf_counter()
            s, p = step(s, p, u8)
            float(jax.device_get(p))
            return inner * block / (time.perf_counter() - t0) / 1e6
        return run

    base = chunk_for(())
    exp = chunk_for(("dc_stack", "fast_atan"))
    pairs, ratios = [], []
    for r in range(rounds):
        a = base()
        b = exp()
        ratios.append(b / a)
        pairs.append({"production_msps": round(a, 1),
                      "experiment_msps": round(b, 1),
                      "ratio": round(b / a, 4)})
        print(f"# scan round {r}: production {a:8.1f}  experiment {b:8.1f}  "
              f"ratio {b/a:.4f}", flush=True)
    ratios.sort()
    return pairs, ratios[len(ratios) // 2], tileF


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if len(sys.argv) > 2 and sys.argv[2] == "scan":
        pairs, med, tileF = scan_paired(rounds=max(3, iters // 4))
        best = max(p["production_msps"] for p in pairs)
        rec = {"healthy": best >= bench.HEALTHY_MSPS, "ts": time.time(),
               "tileF": tileF, "block": bench._BLOCK, "input": "u8_wide",
               "mode": "scan_paired", "pairs": pairs,
               "median_ratio_experiment_vs_production": round(med, 4)}
        out = os.path.join(HERE, "results", "KERNEL_OPTS_r02.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps({"metric": "kernel_opts_median_ratio_scan",
                          "value": round(med, 4), "healthy": rec["healthy"]}))
        print(f"# wrote {out}")
        return
    if len(sys.argv) > 2 and sys.argv[2] == "paired":
        pairs, med, tileF = paired(iters)
        best = max(p["production_msps"] for p in pairs)
        rec = {"healthy": best >= bench.HEALTHY_MSPS, "ts": time.time(),
               "tileF": tileF, "block": bench._BLOCK, "input": "u8_wide",
               "mode": "paired", "pairs": pairs,
               "median_ratio_experiment_vs_production": round(med, 4)}
        out = os.path.join(HERE, "results", "KERNEL_OPTS_r02.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps({"metric": "kernel_opts_median_ratio", "value": med,
                          "healthy": rec["healthy"]}))
        print(f"# wrote {out}")
        return
    rows, tileF = measure(iters)
    by = {r["variant"]: r for r in rows}
    exp, base = by["both_experiments"], by["production"]
    healthy = base["msps"] >= bench.HEALTHY_MSPS
    rec = {"healthy": healthy, "ts": time.time(), "tileF": tileF,
           "block": bench._BLOCK, "input": "u8_wide", "variants": rows,
           "speedup_experiment_vs_production": round(exp["msps"] / base["msps"], 4)}
    out = os.path.join(HERE, "results", "KERNEL_OPTS_r02.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "kernel_opts_speedup",
                      "value": rec["speedup_experiment_vs_production"],
                      "experiment_msps": exp["msps"],
                      "production_msps": base["msps"],
                      "healthy": healthy}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
