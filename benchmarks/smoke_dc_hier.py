"""Real-Mosaic smoke test for the dc_hier kernel path (run before spending a
capture window on its A/B): health-gate with a real transfer, compile both
kernels with opts=("dc_hier",), compare against production ON DEVICE (the
diff reduces to one scalar download), and dump memory_stats for HWID.

Usage: timeout -s INT 900 python benchmarks/smoke_dc_hier.py
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    d = jax.devices()[0]
    print(f"# device: {d.platform} {getattr(d, 'device_kind', '?')}",
          flush=True)
    # health gate: a REAL 1 MB up + compute + down transfer
    t0 = time.perf_counter()
    buf = jax.device_put(np.arange(1 << 18, dtype=np.float32))
    s = float(np.asarray(buf[: 1 << 16]).sum())
    dt = time.perf_counter() - t0
    print(f"# health: 1MB up + 256KB down in {dt:.2f}s (sum {s:.0f})",
          flush=True)
    if dt > 20.0:
        print(json.dumps({"ok": False, "reason": "degraded wire"}))
        return

    try:
        stats = d.memory_stats()
        print(f"# memory_stats: " + json.dumps(
            {k: v for k, v in (stats or {}).items()}), flush=True)
    except Exception as e:
        print(f"# memory_stats unavailable: {e}", flush=True)

    from csdr_tpu.ops.pallas.flagship_fused import (
        flagship_fused_init, flagship_fused_step)
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)

    nch = 64
    block = 1 << 20
    u8 = (jax.jit(lambda: (jnp.arange(block) % 251).astype(jnp.uint8))(),
          jax.jit(lambda: (jnp.arange(block) % 241).astype(jnp.uint8))())
    results = {}
    for name, init, step, tileF in (
            ("narrow", flagship_fused_init, flagship_fused_step, 256),
            ("wide", flagship_fused_wide_init, flagship_fused_wide_step, 512)):
        row = {}
        try:
            t0 = time.perf_counter()

            @jax.jit
            def diff(u8=u8, tf=tileF, st=step, ini=init):
                # dense reference vs the (default) hier production path —
                # opts=("dc_hier",) would compare hier to itself post-flip
                _, ya = st(ini(nch), u8, nch=nch, tileF=tf,
                           opts=("dc_dense",))
                _, yb = st(ini(nch), u8, nch=nch, tileF=tf)
                d = jnp.abs(ya - yb)
                return jnp.max(d), jnp.quantile(d, 0.99), jnp.mean(
                    (d > 0.01).astype(jnp.float32))

            mx, p99, wrap = diff()
            row = {"ok": True,
                   "max_abs_diff": float(jax.device_get(mx)),
                   "p99_abs_diff": float(jax.device_get(p99)),
                   "wrap_fraction": float(jax.device_get(wrap)),
                   "compile_s": round(time.perf_counter() - t0, 1)}
            row["pass"] = row["p99_abs_diff"] < 1e-4 and row["wrap_fraction"] < 0.005
        except Exception as e:
            row = {"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}
        results[name] = row
        print(f"# {name}: {json.dumps(row)[:400]}", flush=True)
    print(json.dumps({"ok": all(r.get("ok") for r in results.values()),
                      "results": results}))


if __name__ == "__main__":
    main()
