"""Serialized capture of the round-3 on-chip artifacts.

Single-tenant relay-tunneled chip (docs/TPU_BACKEND_NOTES.md): one client at
a time, health-gated windows, children never SIGKILLed
(capture_streaming._run_capped).  Round-3 jobs, in order of value:

  1. HONEST_r03.json       — slope-fitted cross-checked throughput + copy
                             verdict with the labeled-spec suspect flags
  2. ABLATION_SUB_r03.json — per-PART stage budget (dc matvec / dc matmul /
                             atan2 div/poly/selects) — aims the kernel work
  3. KERNEL_OPTS_r03.json  — scan-paired A/B of the round-3 dc_hier solve
                             (dedup-proof seeding)
  4. HWID_r03.json         — hardware identity (HBM capacity, int8 rate)
  5. RECEIVERS_r03.json    — on-chip validation of the 8 round-2 receivers
  6. STREAMING_r03.json    — end-to-end ingest incl. the downlink-free
                             `nodl` variants (only the uplink must be
                             healthy)
  7. ABLATION_r03.json     — full stage ladder refresh
  8. ROOFLINE_r03.json     — ceilings + flagship at tuned tiles

TUNE/BACKENDS re-capture is deferred to a follow-up session once the
KERNEL_OPTS verdict decides the production kernel configuration.

Usage: python benchmarks/capture_r03_artifacts.py [max_minutes]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "results")
sys.path.insert(0, HERE)

import capture_streaming as cap  # probe(), _run_capped, _json_line

REPO = os.path.dirname(HERE)


def _user_cache():
    root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(root, "csdr_tpu", "autotune.json")


def run_tune(probe) -> bool:
    """bench.py tune with the hier production kernel; on success refresh the
    packaged cache and record TUNE_r03.json (ported from
    capture_r02_artifacts.run_tune)."""
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
    healthy = best >= 2500.0
    rec = {"healthy": healthy, "best_flagship_msps": round(best, 1),
           "probe_before": probe, "cache": cache}
    with open(os.path.join(RES, "TUNE_r03.json"), "w") as f:
        json.dump(rec, f, indent=1)
    if healthy:
        with open(os.path.join(REPO, "csdr_tpu", "utils",
                               "autotune_tpu.json"), "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        print("# packaged autotune cache refreshed", flush=True)
    else:
        try:
            os.remove(_user_cache())
            print("# degraded sweep — user cache dropped", flush=True)
        except OSError:
            pass
    return healthy


def run_backends(probe) -> bool:
    res = {}
    for be in ("pallas_full", "pallas_wide", "pallas", "xla", "cu8",
               "cu8_wide"):
        out = cap._run_capped([sys.executable, os.path.join(REPO, "bench.py"),
                               "15", be], 1800)
        r = cap._json_line(out) if out else None
        res[be] = (r or {}).get("value")
        print(f"# backend {be}: {res[be]}", flush=True)
    best = max((v for v in (res.get("pallas_full"), res.get("pallas_wide"))
                if v), default=0.0)
    healthy = best >= 2500.0
    with open(os.path.join(RES, "BACKENDS_r03.json"), "w") as f:
        json.dump({"healthy": healthy, "probe_before": probe,
                   "msps_per_backend": res}, f, indent=1)
    return healthy


def run_scanloop(probe) -> bool:
    res = {}
    for be in ("pallas_full:scan", "pallas_wide:scan", "cu8:scan",
               "cu8_wide:scan"):
        out = cap._run_capped([sys.executable, os.path.join(REPO, "bench.py"),
                               "10", be], 1800)
        r = cap._json_line(out) if out else None
        res[be] = (r or {}).get("value")
        print(f"# scanloop {be}: {res[be]}", flush=True)
    best = max((v for v in res.values() if v), default=0.0)
    healthy = best >= 2500.0
    with open(os.path.join(RES, "SCANLOOP_r03.json"), "w") as f:
        json.dump({"healthy": healthy, "probe_before": probe,
                   "msps": res}, f, indent=1)
    return healthy


def _healthy(name: str, key) -> bool:
    try:
        with open(os.path.join(RES, name)) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return False
    if key is None:
        return True
    if callable(key):
        return bool(key(d))
    return bool(d.get(key))


def run_script(rel: str, args: list[str], secs: int, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    import subprocess
    p = None
    cmd = [sys.executable, os.path.join(HERE, rel)] + args
    # mirror _run_capped but with env support
    import signal
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=REPO, env=env)
    try:
        out, _ = p.communicate(timeout=secs)
    except subprocess.TimeoutExpired:
        out = None
        for sig, grace in ((signal.SIGINT, 180), (signal.SIGTERM, 60)):
            try:
                p.send_signal(sig)
                out, _ = p.communicate(timeout=grace)
                break
            except subprocess.TimeoutExpired:
                continue
            except OSError:
                break
    if out:
        print(out.strip()[-3000:], flush=True)
    return out


def _annotate(name: str, probe) -> None:
    try:
        path = os.path.join(RES, name)
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
        todo = {
            "honest": not _healthy("HONEST_r03.json", None),
            "absub": not _healthy("ABLATION_SUB_r03.json", "healthy"),
            "kopts": not _healthy("KERNEL_OPTS_r03.json", "healthy"),
            "hwid": not _healthy("HWID_r03.json", None),
            "receivers": not _healthy("RECEIVERS_r03.json", "all_ok"),
            # keep retrying streaming until a genuinely healthy-window number
            # exists (a degraded-dispatch window records single-digit MSPS;
            # best-of-attempts only improves)
            # ceiling context: the relay's SUSTAINED upload tops out ~80
            # MB/s (measured in-artifact), capping cu8 ingest at ~40 MSPS —
            # 25 MSPS (~8x the reference real-time figure) is a realistic
            # healthy-window bar
            "streaming": not _healthy(
                "STREAMING_r03.json",
                lambda d: (d.get("best") or {}).get("value", 0.0) >= 25.0),
            "ablation": not _healthy("ABLATION_r03.json", "healthy"),
            "roofline": not _healthy("ROOFLINE_r03.json", "healthy"),
            # post-flip recaptures: the hier solve is the production kernel
            # now, so the tuned tiles and per-backend numbers move
            "tune": not _healthy("TUNE_r03.json", "healthy"),
            # settle the u8-wide tileF=256 sweep outlier (13.8 GSPS pinned
            # mid-spike; backends then measured cu8_wide BELOW wide-f32)
            "tileab": not _healthy("KERNEL_TILEF_r03.json", "healthy"),
            # audio layout A/B: the out-of-kernel channel-major transpose is
            # ~half the io/layout floor (ABLATION_r03); measure skipping it
            "audioframes": not _healthy("KERNEL_AF_r03.json", "healthy"),
            # 3-multiply complex DFT (9 vs 12 MXU passes; DFT is 22% of the
            # production-tile kernel budget)
            "dftkara": not _healthy("KERNEL_KARA_r03.json", "healthy"),
            "backends": not _healthy("BACKENDS_r03.json", "healthy"),
            "scanloop": not _healthy("SCANLOOP_r03.json", "healthy"),
        }
        if not any(todo.values()):
            print("# all round-3 artifacts captured", flush=True)
            return
        p = cap.probe()
        ts = time.strftime("%H:%M:%S")
        if p is None:
            print(f"# {ts} probe timed out — relay wedged, sleeping 600 s",
                  flush=True)
            time.sleep(600)
            continue
        print(f"# {ts} wire {p['up_MBps']} up / {p['down_MBps']} down MB/s "
              f"todo={[k for k, v in todo.items() if v]}", flush=True)
        up_ok = p["up_MBps"] >= 80.0
        up_min = p["up_MBps"] >= 10.0

        # streaming FIRST: the window oscillates on a minutes scale, and a
        # fast-wire probe is only predictive of the sub-window immediately
        # after it — every earlier ordering burned the good sub-windows on
        # other jobs and ran streaming in the next stall
        if todo["streaming"] and up_ok:
            try:
                with open(os.path.join(RES, "STREAMING_r03.json")) as f:
                    prev = json.load(f)
                history, best = prev.get("history", []), prev.get("best")
            except (OSError, ValueError):
                history, best = [], None
            variants = ["cu8 nodl"]
            if p["down_MBps"] >= 20.0:
                variants = [None, "cu8", "decim8"] + variants
            elif p["down_MBps"] >= 3.0:
                variants = ["decim8"] + variants
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
                if best is None or r["value"] > best["value"]:
                    best = r
            cap._write(best, history)

        if todo["honest"] and up_min:
            run_script("probe_honest.py", [], 3600)
            _annotate("HONEST_r03.json", p)
        if todo["hwid"] and up_min:
            run_script("probe_hwid.py", ["--alloc"] if up_ok else [], 1800)
            _annotate("HWID_r03.json", p)
        if todo["absub"] and up_ok:
            run_script("probe_ablation.py", ["8", "sub"], 2400)
            _annotate("ABLATION_SUB_r03.json", p)
        # the scan-paired A/B is drift-robust by construction (adjacent
        # production/experiment pairs inside seconds-long dispatches), so it
        # does NOT wait for a drift-stable ladder window
        if todo["kopts"] and up_ok:
            # production is the hier solve now: the meaningful A/B is vs
            # the dense path it replaced (dc_hier would compare hier to
            # itself and overwrite the +17% artifact with a ratio of 1)
            run_script("probe_kernel_opts.py", ["12"], 3600,
                       env_extra={"CSDR_OPTS_EXPERIMENT": "dc_dense"})
            _annotate("KERNEL_OPTS_r03.json", p)
        if todo["tileab"] and up_ok:
            run_script("probe_kernel_opts.py", ["12"], 3600,
                       env_extra={"CSDR_TILEF_AB": "256,2048"})
            _annotate("KERNEL_TILEF_r03.json", p)
        if todo["audioframes"] and up_ok:
            run_script("probe_kernel_opts.py", ["12"], 3600,
                       env_extra={"CSDR_OPTS_EXPERIMENT": "audio_frames",
                                  "CSDR_OPTS_OUT": "KERNEL_AF_r03.json"})
            _annotate("KERNEL_AF_r03.json", p)
        if todo["dftkara"] and up_ok:
            run_script("probe_kernel_opts.py", ["12"], 3600,
                       env_extra={"CSDR_OPTS_EXPERIMENT": "dft_kara",
                                  "CSDR_OPTS_OUT": "KERNEL_KARA_r03.json"})
            _annotate("KERNEL_KARA_r03.json", p)
        if todo["receivers"] and up_ok:
            run_script("validate_receivers.py", [], 2400)
            _annotate("RECEIVERS_r03.json", p)
        if todo["tune"] and up_ok:
            run_tune(p)
        if todo["backends"] and up_ok and not todo["tune"]:
            run_backends(p)
        if todo["scanloop"] and up_ok:
            run_scanloop(p)
        if todo["ablation"] and up_ok:
            run_script("probe_ablation.py", ["8"], 2400)
            _annotate("ABLATION_r03.json", p)
        if todo["roofline"] and up_ok:
            run_script("probe_roofline.py", ["20"], 2400)
            _annotate("ROOFLINE_r03.json", p)
        time.sleep(60 if up_ok else 240)

    print("# budget exhausted", flush=True)


if __name__ == "__main__":
    main()
