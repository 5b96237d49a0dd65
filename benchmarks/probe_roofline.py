"""On-chip roofline probes: measure the device's achievable HBM bandwidth and
MXU throughput with the same timing protocol bench.py uses, then place the
flagship kernels against those ceilings.

Prints one JSON line with:
  device_kind, hbm_copy_GBps   — streaming read+write bandwidth (f32 copy,
                                  64 MB working set, slope-fitted download-terminated chain)
  mxu_bf16_Tflops              — (4096,4096)x(4096,4096) bf16 matmul chain
  flagship_{narrow,wide}_msps  — fused kernel at the autotuned tileF
  bytes_per_sample model       — 8 B in + 4 B audio out (+planes where XLA
                                  materializes them); see docs/PERF.md

Writes ``benchmarks/results/ROOFLINE_r02.json`` (the artifact docs/PERF.md
cites) unless an existing artifact is healthier: runs in the relay's
degraded-latency regime (flagship below bench.py's honest health gate) are
printed but never clobber a healthy recording.

Usage: python benchmarks/probe_roofline.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROUND = os.environ.get("CSDR_ROUND", "r03")
OUT = os.path.join(HERE, "results", f"ROOFLINE_{ROUND}.json")
sys.path.insert(0, os.path.dirname(HERE))


def _time_chain(step, x, iters):
    """Two-point slope timing of a y = step(y) dispatch chain: loops of N
    and 4N steps, each terminated by a 4-byte DOWNLOAD of the final y (the
    relay has acked block_until_ready without executing — a chain-dependent
    transfer is the only completion proof it cannot fake; earlier recordings
    of 4-6 TB/s 'HBM copy' on a ~0.8 TB/s chip came from that hole).
    Returns the time of exactly 3·iters chained steps, the dispatch/RTT
    intercept cancelled."""
    import jax

    y = step(x)
    float(jax.device_get(y.reshape(-1)[0]))
    times = []
    for n_steps in (iters, 4 * iters):
        best = float("inf")
        for _ in range(2):
            y = step(x)
            t0 = time.perf_counter()
            for _ in range(n_steps):
                y = step(y)
            float(jax.device_get(y.reshape(-1)[0]))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return times[1] - times[0]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import jax
    import jax.numpy as jnp

    out = {"device_kind": jax.devices()[0].device_kind,
           "platform": jax.default_backend()}

    # --- HBM streaming bandwidth: probe_honest's hardened copy probe —
    # barriered, NON-AFFINE (y + y^2*eps cannot fold across passes), a fresh
    # value-distinct buffer per rep, slope-fitted.  The previous y = x + 1
    # dispatch chain here recorded 14,617 GB/s in a window where the
    # hardened probe measured 1,437 (9x beyond any known part) — an affine
    # chain restarted from the same buffer is relay-replayable.
    import probe_honest

    cres = probe_honest.probe_copy()
    out["hbm_copy_GBps"] = cres["hbm_rw_GBps"]
    out["hbm_copy_detail"] = cres
    out["copy_suspect"] = bool(out["hbm_copy_GBps"]
                               and out["hbm_copy_GBps"] > 1700.0)

    # --- MXU bf16 sustained: chained (4096,4096) @ const
    m = 4096
    w = jax.jit(lambda: (jnp.ones((m, m), jnp.bfloat16) * 1e-3))()
    a0 = jax.jit(lambda: jnp.ones((m, m), jnp.bfloat16))()
    mm = jax.jit(lambda a: jnp.dot(a, w, preferred_element_type=jnp.bfloat16))
    dt = _time_chain(mm, a0, iters)
    out["mxu_bf16_Tflops"] = round(3 * iters * 2 * m**3 / dt / 1e12, 1)

    # --- flagship kernels at cached tiles (same protocol as bench.py)
    import bench

    for label, backend in (("flagship_narrow", "pallas_full"),
                           ("flagship_wide", "pallas_wide")):
        try:
            # run() resolves tileF via the autotune cache when None
            from csdr_tpu.utils import autotune
            kname = ("flagship_fused" if backend == "pallas_full"
                     else "flagship_fused_wide")
            t = autotune.lookup(kname, 64)
            out[f"{label}_msps"] = round(bench.run(backend, iters, tileF=t), 1)
            out[f"{label}_tileF"] = t
        except Exception as e:  # record, keep probing
            out[f"{label}_error"] = f"{type(e).__name__}: {e}"[:160]
    try:
        out["flagship_wide_u8_msps"] = round(bench.run_u8(iters, wide=True), 1)
    except Exception as e:
        out["flagship_wide_u8_error"] = f"{type(e).__name__}: {e}"[:160]

    # derived light-speed ratios (bytes/sample model: docs/PERF.md §1)
    bw_gbps = out["hbm_copy_GBps"]
    for label, bps in (("flagship_wide", 12.0), ("flagship_narrow", 24.0),
                       ("flagship_wide_u8", 6.0)):
        msps = out.get(f"{label}_msps")
        if msps:
            light = bw_gbps * 1e3 / bps  # MSPS
            out[f"{label}_light_msps"] = round(light, 1)
            out[f"{label}_pct_of_light"] = round(100.0 * msps / light, 1)

    best = max(out.get("flagship_wide_msps", 0.0),
               out.get("flagship_narrow_msps", 0.0))
    # a non-physical copy rate invalidates every light-speed ratio derived
    # from it — the window is NOT healthy even if the flagship ran fast
    out["healthy"] = bool(best >= bench.HEALTHY_MSPS
                          and not out.get("copy_suspect"))
    print(json.dumps(out))

    prev_healthy = False
    try:
        with open(OUT) as f:
            prev_healthy = bool(json.load(f).get("healthy"))
    except (OSError, ValueError):
        pass
    if out["healthy"] or not prev_healthy:
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {OUT}", file=sys.stderr)
    else:
        print("# degraded window; kept existing healthy artifact",
              file=sys.stderr)


if __name__ == "__main__":
    main()
