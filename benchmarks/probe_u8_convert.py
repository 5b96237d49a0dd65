"""On-chip probe: where does the cu8 path's time go?

The cu8 flagship measures well below its 6 B/sample HBM light-speed while the
f32 paths sit near theirs (docs/PERF.md) — so the binding cost is either the
u8 DMA itself or the in-kernel u8→f32 conversion, not bandwidth.  This probe
separates them with minimal Pallas kernels (one (tileH, 128) tile per grid
step, same shapes the flagship uses):

  f32_copy        y = x              (f32 in, f32 out)   — 8 B/elem control
  u8_passthru     y = x              (u8 in, u8 out)     — 2 B/elem: DMA cost
                                                            of 8-bit tiles
  u8_i32_f32      y = cvt(x)         (u8 in, f32 out)    — the shipped route:
                                                            astype(i32)→f32
  u8_<route>      alternates that may lower better on Mosaic (direct f32,
                  i16 hop, bf16 hop) — each tried and reported, or recorded
                  as unsupported if Mosaic rejects the lowering.
  p32_unpack      int32 tiles carrying 4 packed u8 samples per word (a host/
                  native-reader layout), unpacked in-kernel with shifts+masks
                  into 4 f32 sub-tiles — bypasses Mosaic's 8-bit tile
                  handling entirely; the candidate fix if u8_passthru itself
                  is slow.  Writes the sum of the sub-tiles (keeps output
                  traffic comparable to the converted-elements measure).

Also times the full wide flagship kernel u8 vs f32 at the SAME tileF, so the
end-to-end conversion penalty is measured in situ, and sweeps tileH for the
conversion kernel (u8 DMAs are small; latency may dominate at small tiles).

Prints one JSON line and writes benchmarks/results/U8_CONVERT_r02.json
(healthy runs only: f32_copy below HEALTH_GBPS means the relay is in its
degraded-latency regime — retry later instead of recording).

Usage: python benchmarks/probe_u8_convert.py [iters]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROUND = os.environ.get("CSDR_ROUND", "r03")
OUT = os.path.join(HERE, "results", f"U8_CONVERT_{ROUND}.json")
sys.path.insert(0, os.path.dirname(HERE))

HEALTH_GBPS = 200.0  # healthy windows measure ~1 TB/s streaming f32 copy

ROWS = 1 << 16       # 65536 rows x 128 lanes = 8.4M elems per array
LANES = 128


def _mk_kernel(route: str):
    import jax
    import jax.numpy as jnp

    def kernel(s_ref, x_ref, y_ref):
        # s is a runtime scalar that is ALWAYS 0 but is derived from the
        # previous iteration's output: each dispatch depends on the last, so
        # the relay cannot dedup/cache repeated identical calls (it does —
        # unchained timing loops here report physically impossible rates).
        x = x_ref[0]
        s = s_ref[0, 0]
        if x.dtype == jnp.float32:
            x = x + s.astype(jnp.float32) * 1e-30
        elif x.dtype == jnp.uint8:
            x = x ^ s.astype(jnp.uint8)
        else:  # int32 packed words
            x = x ^ s
        if route == "f32_copy" or route == "u8_passthru":
            y_ref[0] = x
        elif route == "u8_i32_f32":
            y_ref[0] = x.astype(jnp.int32).astype(jnp.float32) * (1.0 / 127.5) - 1.0
        elif route == "u8_f32":
            y_ref[0] = x.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        elif route == "u8_i16_f32":
            y_ref[0] = x.astype(jnp.int16).astype(jnp.float32) * (1.0 / 127.5) - 1.0
        elif route == "u8_bf16_f32":
            y_ref[0] = (x.astype(jnp.bfloat16).astype(jnp.float32)
                        * (1.0 / 127.5) - 1.0)
        elif route == "p32_unpack":
            acc = None
            for m in range(4):
                b = jax.lax.shift_right_logical(x, jnp.int32(8 * m)) & 255
                f = b.astype(jnp.float32) * (1.0 / 127.5) - 1.0
                acc = f if acc is None else acc + f
            y_ref[0] = acc
        else:
            raise ValueError(route)

    return kernel


def _run_route(route: str, iters: int, tileH: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_u8 = route.startswith("u8")
    out_u8 = route == "u8_passthru"
    p32 = route == "p32_unpack"
    in_dt = jnp.uint8 if in_u8 else (jnp.int32 if p32 else jnp.float32)
    out_dt = jnp.uint8 if out_u8 else jnp.float32
    T = ROWS // tileH

    f = pl.pallas_call(
        _mk_kernel(route),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, tileH, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tileH, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tileH, LANES), out_dt),
        interpret=interpret,
    )

    def _step(x, s):
        y = f(s.reshape(1, 1), x)
        # always 0 at runtime, but data-dependent on y: serializes the chain
        s2 = (jnp.abs(y.ravel()[0].astype(jnp.float32)) * 1e-30).astype(jnp.int32)
        return y, s2

    fj = jax.jit(_step)
    x = jax.jit(lambda: jnp.full((T, tileH, LANES), 137, dtype=in_dt))()
    y, s = fj(x, jax.jit(lambda: jnp.zeros((), jnp.int32))())
    int(jax.device_get(s))
    if interpret:
        return y
    # two-point slope, download-terminated (the relay can ack
    # block_until_ready without executing — docs/TPU_BACKEND_NOTES.md);
    # the carried scalar chains every dispatch, so one 4-byte device_get
    # forces the whole run
    times = []
    for n_it in (iters, 4 * iters):
        best = float("inf")
        for _ in range(2):
            s2 = jax.jit(lambda: jnp.zeros((), jnp.int32))()
            t0 = time.perf_counter()
            for _ in range(n_it):
                y, s2 = fj(x, s2)
            int(jax.device_get(s2))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    dt = times[1] - times[0]  # exactly 3·iters chained dispatches
    n = ROWS * LANES
    bytes_elem = (1 if in_u8 else 4) + (1 if out_u8 else 4)
    samples = n * 4 if p32 else n  # p32 words carry 4 packed u8 samples
    return {
        "GBps": round(3 * iters * bytes_elem * n / dt / 1e9, 1),
        "Gsamples_per_s": round(3 * iters * samples / dt / 1e9, 2),
    }


def _flagship_pair(iters: int, tileF: int):
    """Wide flagship u8 vs f32 at identical tileF: in-situ conversion cost."""
    import jax
    import jax.numpy as jnp
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)

    nch = 64
    block = 1 << 22
    out = {}
    step = functools.partial(flagship_fused_wide_step, nch=nch, tileF=tileF)
    for tag in ("f32", "u8"):
        if tag == "u8":
            x = (jax.jit(lambda: jnp.full((block,), 137, jnp.uint8))(),
                 jax.jit(lambda: jnp.full((block,), 120, jnp.uint8))())
            call = jax.jit(lambda st, a, b: step(st, (a, b)))
        else:
            # complex is joined INSIDE jit: a complex program parameter can
            # poison later transfers on this backend, and the probe below
            # must download (docs/TPU_BACKEND_NOTES.md)
            x = (jax.jit(lambda: jnp.full((block,), 0.5, jnp.float32))(),
                 jax.jit(lambda: jnp.full((block,), 0.25, jnp.float32))())
            call = jax.jit(lambda st, r, i: step(st, jax.lax.complex(r, i)))
        probe = jax.jit(lambda y: jnp.real(
            jax.tree.leaves(y)[0]).reshape(-1)[0].astype(jnp.float32))
        st, y = call(flagship_fused_wide_init(nch), *x)
        float(jax.device_get(probe(y)))
        # two-point slope, download-terminated (state-chained dispatches)
        times = []
        for n_it in (iters, 4 * iters):
            best = float("inf")
            for _ in range(2):
                st = flagship_fused_wide_init(nch)
                t0 = time.perf_counter()
                for _ in range(n_it):
                    st, y = call(st, *x)
                float(jax.device_get(probe(y)))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        out[f"flagship_wide_{tag}_msps_tileF{tileF}"] = round(
            3 * iters * block / (times[1] - times[0]) / 1e6, 1)
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    res = {"rows": ROWS, "lanes": LANES}
    for route in ("f32_copy", "u8_passthru", "u8_i32_f32", "u8_f32",
                  "u8_i16_f32", "u8_bf16_f32", "p32_unpack"):
        try:
            res[route] = _run_route(route, iters, tileH=512)
        except Exception as e:  # Mosaic may reject a lowering — record it
            res[route] = f"unsupported: {type(e).__name__}: {e}"[:160]
        print(f"# {route}: {res[route]}", flush=True)

    # tileH sweep for the shipped route (DMA latency vs VMEM pressure)
    sweep = {}
    for tileH in (128, 256, 512, 1024, 2048):
        try:
            sweep[tileH] = _run_route("u8_i32_f32", iters, tileH=tileH)
        except Exception as e:
            sweep[tileH] = f"unsupported: {type(e).__name__}"[:80]
        print(f"# u8_i32_f32 tileH={tileH}: {sweep[tileH]}", flush=True)
    res["u8_i32_f32_tileH_sweep"] = sweep

    try:
        res.update(_flagship_pair(max(10, iters // 5), tileF=128))
    except Exception as e:
        res["flagship_pair"] = f"failed: {type(e).__name__}: {e}"[:160]

    healthy = (isinstance(res.get("f32_copy"), dict)
               and res["f32_copy"]["GBps"] >= HEALTH_GBPS)
    res["healthy_window"] = healthy
    print(json.dumps(res), flush=True)
    if healthy:
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)
        print(f"# wrote {OUT}")
    else:
        print("# degraded relay window — artifact NOT written; retry later")


if __name__ == "__main__":
    if os.environ.get("CSDR_PROBE_INTERPRET"):
        # CPU smoke: conversion-route kernels produce the expected values
        import numpy as np

        y = _run_route("u8_i32_f32", 1, tileH=128, interpret=True)
        expect = 137 / 127.5 - 1.0
        assert abs(float(np.asarray(y).ravel()[0]) - expect) < 1e-6
        # p32: word 137 has bytes (137, 0, 0, 0) -> sum of 4 converted bytes
        y = _run_route("p32_unpack", 1, tileH=128, interpret=True)
        expect = (137 / 127.5 - 1.0) + 3 * (0 / 127.5 - 1.0)
        assert abs(float(np.asarray(y).ravel()[0]) - expect) < 1e-6
        print("interpret smoke ok")
    else:
        main()
