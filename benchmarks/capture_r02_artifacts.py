"""Serialized capture of ALL missing round-2 on-chip artifacts.

The relay-tunneled chip has long degraded windows (docs/TPU_BACKEND_NOTES.md)
and is single-tenant, so every on-chip measurement must run one client at a
time and only in a healthy window.  This orchestrator owns the chip: it
probes the wire, and when a window opens it runs whichever artifact jobs are
still missing, in order of value:

  0. SCANLOOP_r02.json   — bench.py scan-mode per fused backend (one
                           dispatch = 2048 state-chained steps on device —
                           immune to dispatch-latency regimes; tried in any
                           window where programs upload at all)
  1. STREAMING_r02.json  — end-to-end host→device→host (capture_streaming's
                           bench; needs BOTH directions healthy: the sinks
                           pull ~134 MB of audio back over the wire)
  2. ROOFLINE_r02.json   — probe_roofline.py (self-gated at bench.HEALTHY_MSPS flagship;
                           compute-bound, tolerant of a slow downlink)
  3. U8_CONVERT_r02.json — probe_u8_convert.py (self-gated at 200 GB/s copy)
  4. TUNE_r02.json       — `bench.py tune`: re-sweep tileF per kernel variant
                           in a verified-healthy window (the shipped cache
                           has one degraded-moment outlier: u8-wide@128
                           recorded 21 GSPS where a healthy window measures
                           78), then refresh the packaged cache
                           csdr_tpu/utils/autotune_tpu.json
  5. BACKENDS_r02.json   — same-window bench.py comparison of every backend
                           (pallas_full / pallas_wide / pallas / xla / cu8 /
                           cu8_wide) at the freshly tuned tiles
  6. BLOCKSWEEP_r02.json — bench.py at 4/8/16 MS blocks: distinguishes
                           dispatch-latency-bound windows from HBM-bound
  7. FFTFIR_r02.json     — bench_fftfir.py (gated here: only attempted right
                           after a self-gated probe succeeded in this window)
  8. SYMSYNC_r02.json    — bench_symsync.py (same gating)

Jobs re-run until their artifact exists (or, for streaming, records a
non-null best); children are never SIGKILLed (capture_streaming._run_capped).

Usage: python benchmarks/capture_r02_artifacts.py [max_minutes]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "results")
sys.path.insert(0, HERE)

import capture_streaming as cap  # probe(), bench(), _run_capped, _json_line


def _have_streaming() -> bool:
    try:
        with open(os.path.join(RES, "STREAMING_r02.json")) as f:
            return json.load(f).get("best") is not None
    except (OSError, ValueError):
        return False


def _have(name: str) -> bool:
    return os.path.exists(os.path.join(RES, name))


def _healthy_artifact(name: str, key: str) -> bool:
    """True if the artifact exists and recorded a healthy window (probes
    write degraded runs too, flagged: roofline 'healthy', u8 'healthy_window')."""
    try:
        with open(os.path.join(RES, name)) as f:
            return bool(json.load(f).get(key))
    except (OSError, ValueError):
        return False


def run_script(rel: str, args: list[str], secs: int):
    out = cap._run_capped([sys.executable, os.path.join(HERE, rel)] + args, secs)
    if out:
        print(out.strip()[-2000:], flush=True)
    return out


REPO = os.path.dirname(HERE)


def _user_cache():
    root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(root, "csdr_tpu", "autotune.json")


def run_tune(probe) -> bool:
    """bench.py tune in this window; on success refresh the packaged cache
    and record TUNE_r02.json.  Healthy iff the swept flagship best clears
    bench.py's honest health gate (HEALTHY_MSPS)."""
    out = cap._run_capped([sys.executable, os.path.join(REPO, "bench.py"),
                           "tune", "10"], 3600)
    if out:
        print(out.strip()[-2000:], flush=True)
    try:
        with open(_user_cache()) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        return False
    best = max((v.get("msps", 0.0) for k, v in cache.items()
                if k.startswith(("flagship_fused:tpu", "flagship_fused_wide:tpu"))
                and not k.endswith(":u8")), default=0.0)
    healthy = best >= 2500.0  # honest gate: bench.HEALTHY_MSPS
    rec = {"healthy": healthy, "best_flagship_msps": round(best, 1),
           "probe_before": probe, "cache": cache}
    with open(os.path.join(RES, "TUNE_r02.json"), "w") as f:
        json.dump(rec, f, indent=1)
    if healthy:
        with open(os.path.join(REPO, "csdr_tpu", "utils",
                               "autotune_tpu.json"), "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        print("# packaged autotune cache refreshed", flush=True)
    else:
        # a degraded-window sweep must not poison later lookups (the user
        # cache overrides the packaged one) — drop it and retry next window
        try:
            os.remove(_user_cache())
            print("# degraded sweep — user cache dropped", flush=True)
        except OSError:
            pass
    return healthy


def run_blocksweep(probe) -> bool:
    """Block-size sweep of the best backends: distinguishes dispatch-latency-
    bound windows (throughput rises with block size) from HBM-bound ones.
    Records BLOCKSWEEP_r02.json; healthy iff the best point clears the honest gate."""
    res = {}
    best = 0.0
    for be in ("pallas_full", "cu8"):
        for blk_log2 in (22, 23, 24):
            env = dict(os.environ, CSDR_BENCH_BLOCK=str(1 << blk_log2))
            import subprocess
            try:
                p = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"), "10", be],
                    stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                    text=True, cwd=REPO, env=env, timeout=1500)
                r = cap._json_line(p.stdout)
            except subprocess.TimeoutExpired:
                r = None
            v = (r or {}).get("value")
            res[f"{be}_block2e{blk_log2}"] = v
            best = max(best, v or 0.0)
            print(f"# blocksweep {be} 2^{blk_log2}: {v}", flush=True)
    healthy = best >= 2500.0  # honest gate: bench.HEALTHY_MSPS
    with open(os.path.join(RES, "BLOCKSWEEP_r02.json"), "w") as f:
        json.dump({"healthy": healthy, "probe_before": probe,
                   "msps": res}, f, indent=1)
    return healthy


def run_scanloop(probe) -> bool:
    """bench.py scan-mode (one dispatch = 2048 state-chained steps inside
    lax.scan — immune to the relay's dispatch-latency regimes, see
    bench.run_scan) per fused backend, plus the same-window host-loop number
    for pallas_full so the dispatch-latency gap is quantified.  Records
    SCANLOOP_r02.json; healthy iff the best scan point clears the honest gate."""
    res = {}
    for be in ("pallas_full:scan", "pallas_wide:scan", "cu8:scan",
               "pallas_full"):
        out = cap._run_capped([sys.executable, os.path.join(REPO, "bench.py"),
                               "10", be], 1800)
        r = cap._json_line(out) if out else None
        res[be] = (r or {}).get("value")
        print(f"# scanloop {be}: {res[be]}", flush=True)
    best = max((v for k, v in res.items() if k.endswith(":scan") and v),
               default=0.0)
    healthy = best >= 2500.0  # honest gate: bench.HEALTHY_MSPS
    with open(os.path.join(RES, "SCANLOOP_r02.json"), "w") as f:
        json.dump({"healthy": healthy, "probe_before": probe,
                   "msps": res}, f, indent=1)
    # scan health does NOT prove the window's dispatch path is healthy (that
    # is the whole point of scan mode) — only the host-loop point does
    return (res.get("pallas_full") or 0.0) >= 2500.0


def run_backends(probe) -> bool:
    """One bench.py run per backend, same window, tuned tiles (children read
    the user cache).  Healthy iff the best fused backend clears the honest gate."""
    res = {}
    for be in ("pallas_full", "pallas_wide", "pallas", "xla", "cu8", "cu8_wide"):
        out = cap._run_capped([sys.executable, os.path.join(REPO, "bench.py"),
                               "15", be], 1800)
        r = cap._json_line(out) if out else None
        res[be] = (r or {}).get("value")
        print(f"# backend {be}: {res[be]}", flush=True)
    best = max((v for v in (res.get("pallas_full"), res.get("pallas_wide"))
                if v), default=0.0)
    healthy = best >= 2500.0  # honest gate: bench.HEALTHY_MSPS
    with open(os.path.join(RES, "BACKENDS_r02.json"), "w") as f:
        json.dump({"healthy": healthy, "probe_before": probe,
                   "msps_per_backend": res}, f, indent=1)
    return healthy


def _honest_ok(cur_up: float) -> bool:
    """HONEST_r02.json exists and was captured in a window at least as good
    as the current one (re-measure when a healthier window opens, up to the
    80 MB/s healthy-dispatch threshold)."""
    try:
        with open(os.path.join(RES, "HONEST_r02.json")) as f:
            rec = json.load(f)
        return min(rec.get("probe_before", {}).get("up_MBps", 0.0),
                   80.0) >= min(cur_up, 80.0)
    except (OSError, ValueError):
        return False


def run_honest(probe) -> None:
    out = run_script("probe_honest.py", [], 3600)
    if out is not None:
        try:
            path = os.path.join(RES, "HONEST_r02.json")
            with open(path) as f:
                rec = json.load(f)
            rec["probe_before"] = probe
            with open(path, "w") as f:
                json.dump(rec, f, indent=1)
        except (OSError, ValueError):
            pass


def main():
    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 360.0
    deadline = time.time() + 60 * max_minutes

    while time.time() < deadline:
        todo_streaming = not _have_streaming()
        todo_scanloop = not _healthy_artifact("SCANLOOP_r02.json", "healthy")
        todo_roofline = not _healthy_artifact("ROOFLINE_r02.json", "healthy")
        todo_u8 = not _healthy_artifact("U8_CONVERT_r02.json", "healthy_window")
        todo_tune = not _healthy_artifact("TUNE_r02.json", "healthy")
        todo_backends = not _healthy_artifact("BACKENDS_r02.json", "healthy")
        todo_bsweep = not _healthy_artifact("BLOCKSWEEP_r02.json", "healthy")
        todo_fft = not _have("FFTFIR_r02.json")
        todo_sym = not _have("SYMSYNC_r02.json")
        p = cap.probe()
        ts = time.strftime("%H:%M:%S")
        if p is None:
            print(f"# {ts} probe timed out — relay wedged, sleeping 600 s",
                  flush=True)
            time.sleep(600)
            continue
        todo_honest = not _honest_ok(p["up_MBps"])
        if not any((todo_streaming, todo_scanloop, todo_roofline, todo_u8,
                    todo_tune, todo_backends, todo_bsweep, todo_fft,
                    todo_sym, todo_honest)):
            print("# all artifacts captured", flush=True)
            return
        print(f"# {ts} wire {p['up_MBps']} up / {p['down_MBps']} down MB/s "
              f"(todo: streaming={todo_streaming} scanloop={todo_scanloop} "
              f"roofline={todo_roofline} u8={todo_u8} tune={todo_tune} "
              f"backends={todo_backends} fft={todo_fft} sym={todo_sym} "
              f"honest={todo_honest})",
              flush=True)

        # slope-based honesty probe FIRST: it amortizes wire overhead by
        # construction, so any window that can upload programs serves
        if todo_honest and p["up_MBps"] >= 10.0:
            run_honest(p)

        dispatch_ok = p["up_MBps"] >= 80.0     # degraded dispatch collapses up too
        both_ok = dispatch_ok and p["down_MBps"] >= 20.0

        window_proved_healthy = False
        if todo_scanloop and p["up_MBps"] >= 10.0:
            # scan mode amortizes dispatch latency on device — worth trying
            # in any window where programs can be uploaded at all
            window_proved_healthy = run_scanloop(p)
        if todo_roofline and dispatch_ok:
            run_script("probe_roofline.py", ["20"], 2400)
            window_proved_healthy = _healthy_artifact("ROOFLINE_r02.json",
                                                      "healthy")
        if todo_u8 and dispatch_ok:
            run_script("probe_u8_convert.py", ["30"], 2400)
            window_proved_healthy |= _healthy_artifact("U8_CONVERT_r02.json",
                                                       "healthy_window")
        # each job self-reports health; a job may also run when every job
        # before it in the chain is already done (nothing left to prove with)
        probes_done = not (todo_roofline or todo_u8)
        if todo_tune and dispatch_ok and (window_proved_healthy or probes_done):
            window_proved_healthy = run_tune(p)
        if todo_backends and dispatch_ok and \
                (window_proved_healthy or (probes_done and not todo_tune)):
            window_proved_healthy = run_backends(p)
        if todo_bsweep and dispatch_ok and \
                (window_proved_healthy
                 or (probes_done and not todo_tune and not todo_backends)):
            window_proved_healthy = run_blocksweep(p)
        if (todo_fft or todo_sym) and window_proved_healthy:
            # same verified-healthy window: record the un-gated benches
            if todo_fft:
                run_script("bench_fftfir.py",
                           ["--reps", "10", "--out", "results/FFTFIR_r02.json"],
                           2400)
            if todo_sym:
                run_script("bench_symsync.py",
                           ["--nsym", "16384", "--reps", "3",
                            "--out", "results/SYMSYNC_r02.json"], 2400)
        down_partial = dispatch_ok and p["down_MBps"] >= 3.0
        if todo_streaming and (both_ok or down_partial):
            # preserve the existing attempt history (capture_streaming wrote it)
            try:
                with open(os.path.join(RES, "STREAMING_r02.json")) as f:
                    prev = json.load(f)
                history, best = prev.get("history", []), prev.get("best")
            except (OSError, ValueError):
                history, best = [], None
            # decim8 returns 8x less audio — representative end-to-end ingest
            # capturable in windows whose downlink can't carry full rate
            variants = (None, "cu8", "decim8") if both_ok else ("decim8",)
            for variant in variants:
                r = cap.bench(variant)
                if r is None:
                    history.append({"ts": round(time.time(), 1),
                                    "bench": variant or "cf32",
                                    "result": "failed/timeout"})
                    continue
                r["probe_before"] = p
                history.append({"ts": round(time.time(), 1), "bench": r})
                print(json.dumps(r), flush=True)
                # input-samples/s for every variant, each with its own
                # metric name — best-of-any is well-defined
                if best is None or r["value"] > best["value"]:
                    best = r
            cap._write(best, history)
        time.sleep(60 if (dispatch_ok or both_ok) else 240)

    print("# budget exhausted", flush=True)


if __name__ == "__main__":
    main()
