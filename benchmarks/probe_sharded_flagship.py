"""On-chip check for the sharded production kernel (round-5 item 1c).

The round-4 verdict's done-criterion (c): on the real chip, a 1-device-mesh
run of ShardedFlagship must measure within ~10% of the unsharded
flagship_fused_wide kernel — proving the shard_map wrapper adds no cliff.

Two adjacent scan-paired comparisons (the <10%-delta instrument,
docs/TPU_BACKEND_NOTES.md):

  * ``wrapped``: production dt=1 path (delegates to the serial kernel inside
    shard_map) vs the raw kernel scan — prices the shard_map/jit wrapper.
  * ``full``:    force_full=True dt=1 (the whole pre-pass + collective
    program with trivial perms) vs the raw kernel scan — prices the sharded
    program structure itself, the best single-chip estimate of the per-chip
    rate under a pod (collective latency aside; see docs/SHARDING.md).

Writes benchmarks/results/SHARDED_FLAGSHIP_<round>.json.

Usage: python benchmarks/probe_sharded_flagship.py [rounds] [inner]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import bench  # noqa: E402  (fresh-input + probe-seed helpers, health gate)

ROUND = os.environ.get("CSDR_ROUND", "r05")


def _runners(inner: int, tileF: int):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    import numpy as np
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.parallel.flagship import ShardedFlagship

    nch = 64
    block = bench._BLOCK

    def make_scan(one, init):
        def chunk(state, probe, x):
            def body(carry, _):
                st, pr = carry
                st2, y = one(st, x)
                pr2 = y.reshape(-1)[0].astype(jnp.float32) + 0.0 * pr
                return (st2, pr2), None
            return jax.lax.scan(body, (state, probe), None, length=inner)[0]
        step = jax.jit(chunk, donate_argnums=(0,))
        st, pr = step(init(), bench.fresh_seed(), bench.fresh_u8_pair(block))
        float(jax.device_get(pr))  # warm + force

        def run():
            s, p = init(), bench.fresh_seed()
            x = bench.fresh_u8_pair(block)
            t0 = time.perf_counter()
            s, p = step(s, p, x)
            float(jax.device_get(p))
            return inner * block / (time.perf_counter() - t0) / 1e6
        return run

    raw = make_scan(
        lambda st, x: flagship_fused_wide_step(st, x, nch=nch, tileF=tileF),
        lambda: flagship_fused_wide_init(nch))

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("time",))
    variants = {}
    for name, force in (("wrapped", False), ("full", True)):
        sf = ShardedFlagship(mesh, nch=nch, block_size=block, tileF=tileF,
                             force_full=force)
        variants[name] = make_scan(sf._shmap, sf.init)
    return raw, variants


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from csdr_tpu.utils import autotune

    tileF = autotune.lookup("flagship_fused_wide", 64, variant="u8")
    raw, variants = _runners(inner, tileF)

    results = {}
    for name, var in variants.items():
        pairs, ratios = [], []
        for r in range(rounds):
            a = raw()
            b = var()
            ratios.append(b / a)
            pairs.append({"raw_msps": round(a, 1),
                          "sharded_msps": round(b, 1),
                          "ratio": round(b / a, 4)})
            print(f"# {name} round {r}: raw {a:8.1f}  sharded {b:8.1f}  "
                  f"ratio {b/a:.4f}", flush=True)
        ratios.sort()
        med = ratios[len(ratios) // 2]
        results[name] = {"pairs": pairs, "ratio_median": round(med, 4),
                         "within_10pct": med >= 0.90}

    raw_best = max(p["raw_msps"] for v in results.values()
                   for p in v["pairs"])
    rec = {"ts": time.time(), "tileF": tileF, "block": bench._BLOCK,
           "inner": inner, "input": "u8_wide",
           "protocol": "adjacent scan pairs (raw, sharded) per round; "
                       "fresh input content + probe seed per dispatch; "
                       "download-terminated",
           # top-level gates for tools/check_artifacts.py: the wrapped
           # (production dt=1) path is the done-criterion; `healthy` pins
           # the window quality of the raw side it is measured against
           "within_10pct": results["wrapped"]["within_10pct"],
           "healthy": raw_best >= bench.HEALTHY_MSPS,
           "variants": results}
    out = os.path.join(HERE, "results", f"SHARDED_FLAGSHIP_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "sharded_flagship_ratio_wrapped",
                      "value": results["wrapped"]["ratio_median"],
                      "full": results["full"]["ratio_median"]}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
