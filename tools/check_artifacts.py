"""Validate the committed benchmark artifacts and print a round summary.

Each artifact records its own health gate (the relay's windows swing wildly
— docs/PERF.md §4), so "present" is not enough: this tool checks schema +
health flags and prints one line per artifact, then a one-line JSON verdict.
Run it before closing out a round: anything UNHEALTHY is a re-capture TODO
(`python benchmarks/capture_r02_artifacts.py`), anything MISSING was never
recorded.

Usage: python tools/check_artifacts.py [results_dir]
"""

from __future__ import annotations

import json
import os
import sys

RES = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results")

# name -> (health key or None (presence = ok), required fields)
SPEC = {
    # Round-5 artifacts
    "SHARDED_FLAGSHIP_r05.json": ("within_10pct", ["variants"]),
    "GRAPH_WRAP_r05.json": ("meets_95pct", ["pairs", "ratio_median"]),
    "KERNEL_DCPIPE_r05.json": ("healthy", ["pairs"]),
    "HONEST_r05.json": (None, ["scan", "hostloop", "copy", "verdict"]),
    "BACKENDS_r05.json": ("healthy", ["msps_per_backend"]),
    "RECEIVERS_r05.json": ("all_ok", ["rows"]),
    "KERNEL_DCPIPE4K_r05.json": ("healthy", ["pairs"]),
    "ABLATION_r05.json": ("healthy", ["ladder", "stages"]),
    "FEC_r05.json": ("healthy", ["rows"]),
    # standing watcher log: window_found=False is an expected state (the
    # ≥50 MSPS ask is relay-metered; the watcher records every attempt)
    "STREAMING_WATCH_r05.json": (None, ["attempts", "model"]),
    # Round-4 artifacts
    "SCALING_r04.json": ("meets_80pct_target", ["points"]),
    "VPU_ROOFLINE_r04.json": ("healthy", ["vpu", "mxu_bf16_Tflops",
                                          "flagship_wide_pct_of_serial_light"]),
    "KERNEL_KARA_r04.json": ("healthy", ["pairs"]),
    "KERNEL_NCOFOLD_r04.json": ("healthy", ["pairs"]),
    "KERNEL_SPLIT2_r04.json": ("healthy", ["pairs"]),
    "KERNEL_SPLIT2FOLD_r04.json": ("healthy", ["pairs"]),
    "KERNEL_SPLIT4_r04.json": ("healthy", ["pairs"]),
    "KERNEL_FASTATAN_r04.json": ("healthy", ["pairs"]),
    "KERNEL_TILEF_r04.json": ("healthy", ["pairs"]),
    "KERNEL_TILEF_F32_r04.json": ("healthy", ["pairs"]),
    "KERNEL_TILEF8K_r04.json": ("healthy", ["pairs"]),
    "RECEIVERS_r04.json": ("all_ok", ["rows"]),
    "BACKENDS_r04.json": ("healthy", ["msps_per_backend"]),
    "KERNEL_INTERLEAVE_r04.json": ("healthy", ["pairs"]),
    "KERNEL_DCSPLIT_r04.json": ("healthy", ["pairs"]),
    "STREAMING_SWEEP_r04.json": (None, ["sweep", "best_msps"]),
    "HONEST_r04.json": (None, ["scan", "hostloop", "copy", "verdict"]),
    "ABLATION_r04.json": ("healthy", ["ladder", "stages"]),
    # Round-3 artifacts (capture: capture_r03_artifacts.py)
    "HONEST_r03.json": (None, ["scan", "hostloop", "copy", "verdict"]),
    "ROOFLINE_r03.json": ("healthy", ["hbm_copy_GBps", "device_kind"]),
    "KERNEL_OPTS_r03.json": ("healthy", ["pairs"]),
    "ABLATION_r03.json": ("healthy", ["ladder", "stages"]),
    "ABLATION_SUB_r03.json": ("healthy", ["ladder", "parts"]),
    "HWID_r03.json": (None, ["device", "verdict"]),
    "RECEIVERS_r03.json": ("all_ok", ["rows"]),
    "STREAMING_r03.json": ("__best__", ["history"]),
    "SCALING_r03.json": ("meets_80pct_target", ["points"]),
    "KERNEL_TILEF_r03.json": ("healthy", ["pairs"]),
    "KERNEL_AF_r03.json": ("healthy", ["pairs"]),
    "KERNEL_KARA_r03.json": ("healthy", ["pairs"]),
    "TUNE_r03.json": ("healthy", ["best_flagship_msps", "cache"]),
    "BACKENDS_r03.json": ("healthy", ["msps_per_backend"]),
    "SCANLOOP_r03.json": ("healthy", ["msps"]),
    # Round-2 artifacts that carry over (flagship-kernel-independent)
    "U8_CONVERT_r02.json": ("healthy_window", ["u8_i32_f32"]),
    "BLOCKSWEEP_r02.json": ("healthy", ["msps"]),
    "FFTFIR_r02.json": (None, ["results"]),
    "SYMSYNC_r02.json": (None, ["results"]),
}


def main() -> int:
    rows = []
    ok = True
    for name, (hkey, fields) in SPEC.items():
        path = os.path.join(RES, name)
        try:
            with open(path) as f:
                d = json.load(f)
        except OSError:
            rows.append((name, "MISSING", ""))
            ok = False
            continue
        except ValueError as e:
            rows.append((name, "CORRUPT", str(e)[:60]))
            ok = False
            continue
        missing = [k for k in fields if k not in d]
        if missing:
            rows.append((name, "BAD-SCHEMA", f"missing {missing}"))
            ok = False
            continue
        if hkey == "__best__":
            healthy = d.get("best") is not None
            note = (f"best={d['best'].get('value')} {d['best'].get('unit', '')}"
                    if healthy else f"{len(d.get('history', []))} attempts, "
                                    f"no healthy window yet")
        elif hkey is None:
            healthy, note = True, ""
        else:
            healthy = bool(d.get(hkey))
            note = "" if healthy else "recorded in a degraded window"
        rows.append((name, "ok" if healthy else "UNHEALTHY", note))
        if not healthy:
            ok = False

    width = max(len(n) for n in SPEC)
    for name, status, note in rows:
        print(f"{name:<{width}}  {status:<10} {note}")
    summary = {"artifacts": len(SPEC),
               "ok": sum(1 for _, s, _ in rows if s == "ok"),
               "all_healthy": ok}
    print(json.dumps(summary))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
