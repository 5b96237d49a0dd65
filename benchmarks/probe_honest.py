"""Slope-based honest throughput probe — settles what the relay can fake.

Motivation (docs/TPU_BACKEND_NOTES.md): the relay has acked
`block_until_ready` on multi-second dispatches without executing them, and
its recorded "HBM copy" rates (4-6 TB/s) exceed the TPU v5 lite's physical
~0.8 TB/s — so any timing that ends in block_until_ready alone is suspect,
and a single download-terminated measurement still carries one unknown RTT.

Method: every measurement here is a CHAIN of data-dependent work terminated
by a 4-byte download of a value that depends on the whole chain (the relay
cannot fake a transfer, and data dependence forces every step).  Timing
t(N) for several chain lengths N and fitting a line gives
    t(N) = intercept (dispatch+RTT overhead)  +  slope · N (per-step time),
so the slope is the honest per-step device time with the wire fully
amortized out.  Three probes:

  * scan:      one dispatch, lax.scan of `inner` fused flagship steps
               (inner ∈ {64, 256, 1024}) — slope → samples/s on device;
  * hostloop:  N separate dispatches of the same step (N ∈ {8, 32, 128}),
               state chained across dispatches, one download at the end —
               slope → samples/s including per-dispatch overhead;
  * copy:      y = y + 1 on a 64 MB f32 buffer, chained K times inside one
               jit (K ∈ {8, 32, 128}) — slope → honest HBM r+w GB/s.

Records benchmarks/results/HONEST_r02.json.  Single-tenant chip: run this
under the capture orchestrator only.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

ROUND = os.environ.get("CSDR_ROUND", "r03")


def _fit(xs, ts):
    """Least-squares slope+intercept for t = a + b·x."""
    import numpy as np

    b, a = np.polyfit(np.asarray(xs, float), np.asarray(ts, float), 1)
    return float(a), float(b)


def probe_scan(nch=64, block=1 << 22, inners=(64, 256, 1024), reps=3,
               backend="pallas_wide"):
    import jax
    import jax.numpy as jnp
    from csdr_tpu.core.runtime import encode_tree, decode_tree, CEnc
    from csdr_tpu.models.receivers import channelized_fm_receiver

    # pallas_wide: the production flagship backend (BACKENDS_r03 best)
    graph = channelized_fm_receiver(nch, kf=0.6, backend=backend)
    x_in = CEnc(jax.jit(lambda: jnp.full((block, 2), 0.5, jnp.float32))())

    def one(s_enc, x_enc):
        s2, y = graph.apply(decode_tree(s_enc), decode_tree(x_enc))
        return encode_tree(s2), encode_tree(y)

    def chunk(state, probe, x, inner):
        def body(carry, _):
            st, pr = carry
            st2, y = one(st, x)
            leaf = jax.tree.leaves(y)[0]
            arr = leaf.ri if isinstance(leaf, CEnc) else leaf
            return (st2, arr.reshape(-1)[0].astype(jnp.float32) + 0.0 * pr), None
        return jax.lax.scan(body, (state, probe), None, length=inner)[0]

    steps = {inner: jax.jit(lambda s, p, x, i=inner: chunk(s, p, x, i))
             for inner in inners}
    state0 = jax.jit(lambda: encode_tree(graph.init()))()
    # compile + warm every size first so the timed runs are all cache-hot
    for inner in inners:
        st, pr = steps[inner](state0, jnp.float32(0.0), x_in)
        float(jax.device_get(pr))
    times = {}
    for inner in inners:
        best = float("inf")
        for _ in range(reps):
            st, pr = state0, jnp.float32(0.0)
            t0 = time.perf_counter()
            st, pr = steps[inner](st, pr, x_in)
            float(jax.device_get(pr))           # forces the whole chain
            best = min(best, time.perf_counter() - t0)
        times[inner] = best
        print(f"# scan inner={inner}: {best:.4f} s", flush=True)
    a, b = _fit(list(times), list(times.values()))
    return {"times_s": {str(k): round(v, 4) for k, v in times.items()},
            "intercept_s": round(a, 4), "per_step_s": round(b, 6),
            "msps": round(block / b / 1e6, 1) if b > 0 else None}


def probe_hostloop(nch=64, block=1 << 22, ns=(8, 32, 128), reps=3,
                   backend="pallas_wide"):
    import jax
    import jax.numpy as jnp
    from csdr_tpu.core.runtime import encode_tree, decode_tree, CEnc
    from csdr_tpu.models.receivers import channelized_fm_receiver

    graph = channelized_fm_receiver(nch, kf=0.6, backend=backend)
    x_in = CEnc(jax.jit(lambda: jnp.full((block, 2), 0.5, jnp.float32))())

    @jax.jit
    def step(s_enc, x_enc):
        s2, y = graph.apply(decode_tree(s_enc), decode_tree(x_enc))
        return encode_tree(s2), encode_tree(y)

    state0 = jax.jit(lambda: encode_tree(graph.init()))()
    st, y = step(state0, x_in)
    leaf = jax.tree.leaves(y)[0]
    arr = leaf.ri if hasattr(leaf, "ri") else leaf
    float(jax.device_get(arr.reshape(-1)[0]))
    times = {}
    for n in ns:
        best = float("inf")
        for _ in range(reps):
            st = state0
            t0 = time.perf_counter()
            for _ in range(n):
                st, y = step(st, x_in)
            leaf = jax.tree.leaves(y)[0]
            arr = leaf.ri if hasattr(leaf, "ri") else leaf
            # the last y depends on the whole state chain: one download
            # forces every dispatch to have really executed
            float(jax.device_get(arr.reshape(-1)[0]))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
        print(f"# hostloop n={n}: {best:.4f} s", flush=True)
    a, b = _fit(list(times), list(times.values()))
    return {"times_s": {str(k): round(v, 4) for k, v in times.items()},
            "intercept_s": round(a, 4), "per_dispatch_s": round(b, 6),
            "msps": round(block / b / 1e6, 1) if b > 0 else None}


def probe_scan_u8(nch=64, block=1 << 22, inners=(64, 256, 1024), reps=3,
                  opts=()):
    """Same slope protocol on the cu8-wide kernel — the fastest production
    ingest path (uint8 IQ converted in-kernel; bench.py backend cu8_wide).
    Kernel-direct rather than via the Pipeline: the u8 pair input is what a
    native reader ships, and the state chain + download give the same
    honesty guarantees as probe_scan."""
    import jax
    import jax.numpy as jnp
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.utils import autotune

    import bench

    tileF = autotune.lookup("flagship_fused_wide", nch, variant="u8")
    fresh = lambda: bench.fresh_u8_pair(block)

    def chunk(state, probe, x, inner):
        def body(carry, _):
            st, pr = carry
            st2, y = flagship_fused_wide_step(st, x, nch=nch, tileF=tileF,
                                              opts=opts)
            return (st2, y.reshape(-1)[0] + 0.0 * pr), None
        return jax.lax.scan(body, (state, probe), None, length=inner)[0]

    steps = {inner: jax.jit(lambda s, p, x, i=inner: chunk(s, p, x, i))
             for inner in inners}
    for inner in inners:
        st, pr = steps[inner](flagship_fused_wide_init(nch),
                              jnp.float32(0.0), fresh())
        float(jax.device_get(pr))
    times = {}
    for inner in inners:
        best = float("inf")
        for _ in range(reps):
            st, pr, x = (flagship_fused_wide_init(nch),
                         bench.fresh_seed(), fresh())
            t0 = time.perf_counter()
            st, pr = steps[inner](st, pr, x)
            float(jax.device_get(pr))
            best = min(best, time.perf_counter() - t0)
        times[inner] = best
        print(f"# scan_u8 inner={inner}: {best:.4f} s", flush=True)
    a, b = _fit(list(times), list(times.values()))
    return {"times_s": {str(k): round(v, 4) for k, v in times.items()},
            "intercept_s": round(a, 4), "per_step_s": round(b, 6),
            "tileF": tileF, "opts": list(opts),
            "msps": round(block / b / 1e6, 1) if b > 0 else None}


def probe_hostloop_u8(nch=64, block=1 << 22, ns=(8, 32, 128), reps=3,
                      opts=()):
    """Host-dispatch-loop cross-check of probe_scan_u8 (state chained across
    dispatches, one terminal download)."""
    import jax
    import jax.numpy as jnp
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.utils import autotune

    import bench

    tileF = autotune.lookup("flagship_fused_wide", nch, variant="u8")
    fresh = lambda: bench.fresh_u8_pair(block)

    step = lambda st, x: flagship_fused_wide_step(st, x, nch=nch,
                                                  tileF=tileF, opts=opts)
    st, y = step(flagship_fused_wide_init(nch), fresh())
    float(jax.device_get(y.reshape(-1)[0]))
    times = {}
    for n in ns:
        best = float("inf")
        for _ in range(reps):
            st = flagship_fused_wide_init(nch)
            x = fresh()
            t0 = time.perf_counter()
            for _ in range(n):
                st, y = step(st, x)
            float(jax.device_get(y.reshape(-1)[0]))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
        print(f"# hostloop_u8 n={n}: {best:.4f} s", flush=True)
    a, b = _fit(list(times), list(times.values()))
    return {"times_s": {str(k): round(v, 4) for k, v in times.items()},
            "intercept_s": round(a, 4), "per_dispatch_s": round(b, 6),
            "tileF": tileF, "opts": list(opts),
            "msps": round(block / b / 1e6, 1) if b > 0 else None}


def probe_copy(nbytes=1 << 26, ks=(8, 32, 128), reps=3):
    import jax
    import jax.numpy as jnp

    n = nbytes // 4

    def make(k):
        @jax.jit
        def f(y):
            for _ in range(k):
                # barriered AND non-affine: k chained affine adds could in
                # principle fold to one pass even past a barrier-shaped
                # excuse; y + y²·ε cannot compose across steps, so each pass
                # provably reads and writes the full buffer
                y = jax.lax.optimization_barrier(y + y * y * 1e-30)
            return y
        return f

    fs = {k: make(k) for k in ks}
    # a FRESH, DISTINCT input buffer per rep: reps that reuse the same device
    # buffer and program are byte-identical dispatches the relay can dedup
    # (CLAUDE.md rule 6a) — observed as an impossible 1.4 TB/s "copy" rate on
    # an 0.82 TB/s part when rep 2's chain replayed from the relay's cache
    seed = jax.jit(lambda v: jnp.full((n,), v, jnp.float32))
    for k in ks:
        float(jax.device_get(fs[k](seed(jnp.float32(k))).reshape(-1)[0]))
    times = {}
    counter = [0.0]
    for k in ks:
        best = float("inf")
        for _ in range(reps):
            counter[0] += 1.0
            y0 = seed(jnp.float32(counter[0]))
            float(jax.device_get(y0.reshape(-1)[0]))  # settle the upload
            t0 = time.perf_counter()
            y = fs[k](y0)
            float(jax.device_get(y.reshape(-1)[0]))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
        print(f"# copy k={k}: {best:.4f} s", flush=True)
    a, b = _fit(list(times), list(times.values()))
    return {"times_s": {str(k): round(v, 4) for k, v in times.items()},
            "intercept_s": round(a, 4), "per_pass_s": round(b, 6),
            # each pass reads + writes the buffer once
            "hbm_rw_GBps": round(2 * nbytes / b / 1e9, 1) if b > 0 else None}


def main():
    res = {"scan": probe_scan(), "hostloop": probe_hostloop(),
           "scan_u8": probe_scan_u8(), "hostloop_u8": probe_hostloop_u8(),
           "copy": probe_copy()}
    # sanity verdicts the judge can read directly.  Anti-fabrication gating
    # (advisor round 2): the gate stays at the LABELED part's spec — the
    # relay's forced topology and device_kind both say v5e (819 GB/s duplex
    # paper spec) — and windows that exceed it are surfaced as SUSPECT via a
    # separate flag rather than blessed, because the same chip's MXU measures
    # at the v5e peak (182 Tflops, ~20% of v6e's): a >spec copy rate and a
    # v5e MXU rate are mutually contradictory until benchmarks/probe_hwid.py
    # resolves the part's identity.  1700 GB/s (v6e spec + margin) remains
    # the any-known-part physical bound; above it the reading is the relay
    # replay signature, full stop.
    hbm = res["copy"]["hbm_rw_GBps"]
    LABELED_SPEC_GBPS = 819.0   # v5e duplex r+w paper spec
    ANY_PART_GBPS = 1700.0      # v6e spec 1640 + measurement margin
    res["verdict"] = {
        "copy_within_labeled_spec": bool(hbm and hbm <= 1.1 * LABELED_SPEC_GBPS),
        "exceeds_labeled_spec": bool(hbm and hbm > 1.1 * LABELED_SPEC_GBPS),
        "copy_physical": bool(hbm and hbm <= ANY_PART_GBPS),
        "suspect_identity_contradiction": bool(
            hbm and 1.1 * LABELED_SPEC_GBPS < hbm <= ANY_PART_GBPS),
        "scan_vs_hostloop_ratio": (
            round(res["hostloop"]["msps"] / res["scan"]["msps"], 2)
            if res["scan"]["msps"] and res["hostloop"]["msps"] else None),
        "scan_vs_hostloop_ratio_u8": (
            round(res["hostloop_u8"]["msps"] / res["scan_u8"]["msps"], 2)
            if res["scan_u8"]["msps"] and res["hostloop_u8"]["msps"]
            else None),
        # headline from the SCAN probes only: the scan is the primary
        # instrument (one dispatch, seconds of chained device work) and its
        # t(N) is required monotone; a host-loop whose t(8) > t(32) (window
        # hiccup on one point) produces a too-shallow slope and an inflated
        # msps — observed once at +18%, hence this rule
        "flagship_best_msps": max(
            res["scan"]["msps"] or 0.0, res["scan_u8"]["msps"] or 0.0),
        "times_monotonic": {
            k: bool(all(b >= a for a, b in zip(ts, ts[1:])))
            for k, ts in ((k, [res[k]["times_s"][s]
                               for s in sorted(res[k]["times_s"], key=int)])
                          for k in ("scan", "hostloop", "scan_u8",
                                    "hostloop_u8"))},
    }
    out = os.path.join(HERE, "results", f"HONEST_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["verdict"] | {
        "scan_msps": res["scan"]["msps"],
        "hostloop_msps": res["hostloop"]["msps"],
        "copy_GBps": hbm}), flush=True)


if __name__ == "__main__":
    main()
