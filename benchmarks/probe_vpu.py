"""VPU roofline: measure the chip's sustained vector-unit throughput and
place the flagship kernels against a CORRECT ceiling (round-3 verdict,
weak #2 / next-round #1).

docs/PERF.md §2 proved the flagship is neither HBM-bound (4%) nor
MXU-useful-FLOP-bound (2.5%), i.e. the binding resource is the VPU's
elementwise lane throughput plus the MXU *passes* it issues (the padded
block-diagonal DFT and DC decay matmuls move many more MXU flops than the
"useful" 470/sample count) — but no vector-op ceiling had been measured, so
"speed-of-light per chip" was unfalsifiable.  This probe:

  1. measures sustained VPU f32 fma throughput with the honest protocol
     (state-chained y←f(y) dispatches, NON-AFFINE every 16 steps — the relay
     replays affine chains, docs/TPU_BACKEND_NOTES.md — value-distinct
     evolution, two-point slope, download-terminated);
  2. measures the MXU bf16 sustained rate and the HBM duplex rate with the
     existing hardened probes (same session = same window);
  3. measures the flagship wide f32 + cu8 kernels in the same window;
  4. places them against a per-sample resource model counted from the
     kernel source (docs/PERF.md §2c table):

         t/sample ≥ vpu_ops/VPU  +  mxu_flops/MXU  +  hbm_bytes/HBM   (serial)
         t/sample ≥ max(...)                                         (overlap)

     — "pct_of_serial_light" is against the no-overlap sum (every resource
     waits for the others), "pct_of_overlap_light" against the max-resource
     bound (perfect overlap).  The truth is between; both are printed so the
     headroom claim is falsifiable.

Writes benchmarks/results/VPU_ROOFLINE_<round>.json (keep-healthy rule:
degraded windows never clobber a healthy artifact).

Usage: python benchmarks/probe_vpu.py [iters]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROUND = os.environ.get("CSDR_ROUND", "r04")
OUT = os.path.join(HERE, "results", f"VPU_ROOFLINE_{ROUND}.json")
sys.path.insert(0, os.path.dirname(HERE))

# ---------------------------------------------------------------------------
# Per-sample resource model, counted from the kernel source (one complex
# input sample through flagship_fused_wide at nch=64, R=2, L+1=15 taps,
# production opts: hier DC, cdot3 DFT).  Derivation: docs/PERF.md §2c.
# vpu_ops counts one elementwise lane-op (fma = 1) over the (tileH, 128)
# panels; mxu_flops counts ISSUED flops of the (., 128)x(128, 128) bf16
# passes (2·128 per sample-pass — block-diagonal zeros included, the MXU
# cannot skip them); hbm_bytes is the §1 model.
OPS_MODEL = {
    # round 4 production: NCO folded into constants (−4 VPU ops vs r04's
    # pre-flip 111/117 — KERNEL_SPLIT2FOLD_r04); split2 leaves op counts
    # unchanged (it only exposes MXU/VPU overlap to the scheduler, which
    # moves the measured point BETWEEN the serial and overlap lights).
    "flagship_wide": {
        "vpu_ops": 107.0,   # DC 18 + FIR 34 + DFT 16 + demod 9
                            # + atan2 26 + kf 1 + misc 3  (NCO folded)
        "mxu_passes": 18,   # DC dot3 3x2 + DFT cdot3 12
        "mxu_flops": 18 * 2 * 128,
        "hbm_bytes": 12.0,
    },
    "flagship_wide_u8": {
        "vpu_ops": 113.0,   # + in-kernel u8→i32→f32 convert+scale (3 x 2)
        "mxu_passes": 18,
        "mxu_flops": 18 * 2 * 128,
        "hbm_bytes": 6.0,
    },
}


def probe_vpu_fma(iters: int = 8, ilp: int = 1):
    """Sustained VPU f32 throughput in fma-equivalent lane-ops/s.

    One dispatch = fori_loop(M) over an unrolled K-step fma block
    (y ← y·a_k + b_k with per-step distinct constants) with an
    alternating-sign quadratic guard every 16 steps (y ← y + y²·ε): the
    composition is NON-affine, so neither XLA's simplifier nor the relay
    can fold or replay it, and values stay bounded (|y| wanders ~O(10),
    the guards' drift cancels in sign pairs, and a per-block clip bounds
    the tail).  Arithmetic intensity = M·(K+…)/8 bytes ≈ 2,900 ops/byte —
    three orders past any HBM/VPU crossover, so the loop is pure VPU.

    ``ilp``: number of INDEPENDENT per-element chains advanced in lockstep
    (y_1..y_P each get the step-k fma before any gets k+1, combined only
    at the end).  A single dependent chain measures fma LATENCY-bound
    issue; the true throughput ceiling is the max over an ilp sweep —
    main() records both so the roofline pegs to the machine, not to one
    chain's latency.
    """
    import jax
    import jax.numpy as jnp

    S = (4096, 128)            # 2 MB f32: one XLA fusion, HBM touched once
    K = 128                    # unrolled fma steps per fori iteration
    M = 160 // ilp or 1        # fori iterations per dispatch (work ~const)
    GUARD = 16
    A = [np.float32(1.0 + (1e-4 if k % 2 else -1e-4)) for k in range(K)]
    B = [np.float32((1e-3 if k % 2 else -1e-3) * (1.0 + k / K))
         for k in range(K)]

    def kblock(ys):
        for k in range(K):
            ys = [y * A[k] + B[k] for y in ys]
            if k % GUARD == GUARD - 1:
                eps = jnp.float32(1e-6 if (k // GUARD) % 2 else -1e-6)
                ys = [y + y * y * eps for y in ys]
        return [jnp.clip(y, -32.0, 32.0) for y in ys]

    @jax.jit
    def step(y):
        # P independent chains seeded from distinct affine views of y,
        # folded back with a non-affine mix so none is dead
        ys = [y * jnp.float32(1.0 + 0.01 * p) + jnp.float32(0.001 * p)
              for p in range(ilp)]
        def body(i, ys):
            return kblock(ys)
        ys = jax.lax.fori_loop(0, M, body, ys)
        out = ys[0]
        for y in ys[1:]:
            out = out + y * jnp.float32(1e-3)
        return out

    # value-distinct start (golden-ratio lattice — no two elements equal)
    y0 = jax.jit(lambda: jnp.mod(
        jnp.arange(S[0] * S[1], dtype=jnp.float32) * jnp.float32(0.6180339887),
        jnp.float32(7.0)).reshape(S) - 3.0)()

    ops_per_elem = ilp * M * (K + 2 * (K // GUARD) + 2)  # fma+guards+clip
    y = step(y0)
    probe = float(jax.device_get(y.reshape(-1)[0]))
    if not math.isfinite(probe):
        raise RuntimeError(f"vpu probe diverged: {probe}")
    times = []
    for n_steps in (iters, 4 * iters):
        best = float("inf")
        for _ in range(2):
            y = step(y0)
            t0 = time.perf_counter()
            for _ in range(n_steps):
                y = step(y)
            probe = float(jax.device_get(y.reshape(-1)[0]))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    if not math.isfinite(probe):
        raise RuntimeError(f"vpu probe diverged: {probe}")
    dt = times[1] - times[0]
    total_ops = 3 * iters * ops_per_elem * S[0] * S[1]
    return {"vpu_f32_Gops": round(total_ops / dt / 1e9, 1),
            "ilp": ilp,
            "ops_per_dispatch": ops_per_elem * S[0] * S[1],
            "per_dispatch_ms": round(dt / (3 * iters) * 1e3, 3),
            "shape": list(S), "unroll_k": K, "fori_m": M}


def probe_mxu(iters: int = 20):
    """Sustained bf16 MXU rate — probe_roofline's chained matmul."""
    import jax
    import jax.numpy as jnp
    import probe_roofline

    m = 4096
    w = jax.jit(lambda: (jnp.ones((m, m), jnp.bfloat16) * 1e-3))()
    a0 = jax.jit(lambda: jnp.ones((m, m), jnp.bfloat16))()
    mm = jax.jit(lambda a: jnp.dot(a, w, preferred_element_type=jnp.bfloat16))
    dt = probe_roofline._time_chain(mm, a0, iters)
    return round(3 * iters * 2 * m ** 3 / dt / 1e12, 1)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import bench
    import probe_honest

    out = {"ts": time.time(),
           "device_kind": jax.devices()[0].device_kind,
           "protocol": "chained non-affine fma loop, two-point slope, "
                       "download-terminated; flagship + MXU + HBM probed in "
                       "the SAME window; model table docs/PERF.md §2c"}

    # ILP sweep: a single dependent chain measures fma latency-bound issue;
    # the CEILING is the max over independent-chain counts (the roofline
    # must peg to the machine's throughput, not one chain's latency)
    sweep = []
    for p in (1, 2, 4, 8):
        r = probe_vpu_fma(iters, ilp=p)
        sweep.append(r)
        print(f"# vpu ilp={p}: {r['vpu_f32_Gops']:.1f} Gops", flush=True)
    out["vpu_ilp_sweep"] = sweep
    out["vpu"] = max(sweep, key=lambda r: r["vpu_f32_Gops"])
    vpu_gops = out["vpu"]["vpu_f32_Gops"]
    out["mxu_bf16_Tflops"] = probe_mxu(max(12, iters))
    cres = probe_honest.probe_copy()
    out["hbm_rw_GBps"] = cres["hbm_rw_GBps"]
    out["copy_suspect"] = bool(out["hbm_rw_GBps"]
                               and out["hbm_rw_GBps"] > 1700.0)

    # flagship kernels, same window
    from csdr_tpu.utils import autotune

    msps = {}
    try:
        t = autotune.lookup("flagship_fused_wide", 64)
        msps["flagship_wide"] = round(bench.run("pallas_wide", 12, tileF=t), 1)
        out["flagship_wide_tileF"] = t
    except Exception as e:
        out["flagship_wide_error"] = f"{type(e).__name__}: {e}"[:160]
    try:
        msps["flagship_wide_u8"] = round(bench.run_u8(12, wide=True), 1)
    except Exception as e:
        out["flagship_wide_u8_error"] = f"{type(e).__name__}: {e}"[:160]

    vpu_ops_s = vpu_gops * 1e9
    mxu_flops_s = out["mxu_bf16_Tflops"] * 1e12
    hbm_bytes_s = (out["hbm_rw_GBps"] or 0.0) * 1e9
    for label, m in msps.items():
        mod = OPS_MODEL[label]
        t_vpu = mod["vpu_ops"] / vpu_ops_s
        t_mxu = mod["mxu_flops"] / mxu_flops_s
        t_hbm = mod["hbm_bytes"] / hbm_bytes_s if hbm_bytes_s else 0.0
        serial = 1.0 / (t_vpu + t_mxu + t_hbm) / 1e6     # MSPS
        overlap = 1.0 / max(t_vpu, t_mxu, t_hbm) / 1e6
        out[f"{label}_msps"] = m
        out[f"{label}_serial_light_msps"] = round(serial, 1)
        out[f"{label}_overlap_light_msps"] = round(overlap, 1)
        out[f"{label}_pct_of_serial_light"] = round(100.0 * m / serial, 1)
        out[f"{label}_pct_of_overlap_light"] = round(100.0 * m / overlap, 1)
        out[f"{label}_model"] = mod

    best = max([v for v in msps.values()] or [0.0])
    out["healthy"] = bool(best >= bench.HEALTHY_MSPS
                          and not out["copy_suspect"])
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
