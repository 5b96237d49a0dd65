"""Virtual-mesh structural scaling of ShardedFlagship (the PRODUCTION kernel).

SCALING_r03/r04 measured the generic WBFM ShardedChain; round 5 joined the
production wide kernel to the mesh (parallel/flagship.py), so this probe
answers the matching question for THAT program: how much throughput does the
sharded program structure (suffix-window DC pre-pass + 3 collective rounds +
where-selects) cost vs N independent single-device workers running the bare
serial kernel on the same local segments?

Same efficiency definition as SCALING_r04: ceiling = N synchronized
independent workers (one serial `flagship_fused_wide_step` per device-local
segment, no coupling — the disaggregated upper bound); program =
ShardedFlagship on an N-device mesh over the same global block.  Both sides
run interpret-mode Pallas on virtual CPU devices (the only multi-device
environment here — docs/SHARDING.md explains what transfers to real ICI:
CPU numbers price program STRUCTURE, not interconnect).  Both sides carry
state across steps (iteration i+1 data-depends on i) and end timed regions
with a device_get — the honesty rules are kept even off-chip so the
instrument is the same one the on-chip probes use.

Writes benchmarks/results/SCALING_FLAGSHIP_<round>.json.

Usage: [CSDR_ROUND=r05] python benchmarks/bench_scaling_flagship.py \
           [max_devices] [steps] [tileF]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

ROUND = os.environ.get("CSDR_ROUND", "r05")


def main():
    want = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    tileF = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax

    if len(jax.devices()) < want or jax.devices()[0].platform != "cpu":
        import jax.extend.backend

        jax.extend.backend.clear_backends()
        jax.config.update("jax_num_cpu_devices", want)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import Mesh
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.parallel.flagship import ShardedFlagship

    nch = 64
    nloc = nch * tileF * 2          # samples per device per step
    rng = np.random.default_rng(0)

    def fresh_planes(n, seed):
        r = np.random.default_rng(seed)
        return (r.integers(0, 256, n, np.uint8), r.integers(0, 256, n, np.uint8))

    def time_workers(nd):
        """Ceiling: nd independent serial-kernel workers, one per device,
        states carried, same per-device work as the sharded program."""
        devs = jax.devices()[:nd]

        def one(st, x):
            return flagship_fused_wide_step(st, x, nch=nch, tileF=tileF,
                                            interpret=True)
        step = jax.jit(one)
        states = [jax.device_put(flagship_fused_wide_init(nch), d)
                  for d in devs]
        # warm per device
        for i, d in enumerate(devs):
            x = tuple(jax.device_put(jnp.asarray(p), d)
                      for p in fresh_planes(nloc, 1000 + i))
            states[i], y = step(states[i], x)
            float(jax.device_get(y.reshape(-1)[0]))
        t0 = time.perf_counter()
        ys = [None] * nd
        for s in range(steps):
            for i, d in enumerate(devs):
                x = tuple(jax.device_put(jnp.asarray(p), d)
                          for p in fresh_planes(nloc, s * 64 + i))
                states[i], ys[i] = step(states[i], x)
        for i in range(nd):  # downloads terminate the timed region
            float(jax.device_get(ys[i].reshape(-1)[0]))
        dt = time.perf_counter() - t0
        return steps * nd * nloc / dt / 1e6

    def time_program(nd):
        mesh = Mesh(np.asarray(jax.devices()[:nd]), ("time",))
        sf = ShardedFlagship(mesh, nch=nch, block_size=nd * nloc,
                             tileF=tileF, interpret=True,
                             force_full=nd == 1)
        st = sf.init()
        x = tuple(jax.device_put(jnp.asarray(p), sf.input_sharding())
                  for p in fresh_planes(sf.block_size, 999))
        st, y = sf.step(st, x)   # warm
        float(jax.device_get(y.reshape(-1)[0]))
        t0 = time.perf_counter()
        for s in range(steps):
            x = tuple(jax.device_put(jnp.asarray(p), sf.input_sharding())
                      for p in fresh_planes(sf.block_size, 2000 + s))
            st, y = sf.step(st, x)
        float(jax.device_get(y.reshape(-1)[0]))
        dt = time.perf_counter() - t0
        return steps * sf.block_size / dt / 1e6

    points = []
    nd = 1
    while nd <= want:
        ceil = time_workers(nd)
        prog = time_program(nd)
        eff = prog / ceil
        points.append({"devices": nd, "ceiling_msps": round(ceil, 2),
                       "program_msps": round(prog, 2),
                       "efficiency": round(eff, 3)})
        print(f"# n={nd}: ceiling {ceil:8.2f}  program {prog:8.2f}  "
              f"eff {eff:.3f}", flush=True)
        nd *= 2

    effs = [p["efficiency"] for p in points if p["devices"] > 1]
    rec = {
        "ts": time.time(),
        "nch": nch, "tileF": tileF, "nloc": nloc, "steps": steps,
        "protocol": "interpret-mode Pallas on virtual CPU devices; ceiling = "
                    "N independent serial-kernel workers (state-chained, "
                    "fresh content per step, download-terminated); program = "
                    "ShardedFlagship on the N-device 'time' mesh over the "
                    "same global block; n=1 program uses force_full=True so "
                    "the full pre-pass+collective structure is priced. "
                    "CPU numbers measure program STRUCTURE, not ICI "
                    "(docs/SHARDING.md)",
        "points": points,
        "meets_80pct_target": bool(effs and min(effs) >= 0.80),
    }
    out = os.path.join(HERE, "results", f"SCALING_FLAGSHIP_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "scaling_flagship_min_eff",
                      "value": min(effs) if effs else None,
                      "meets_80pct_target": rec["meets_80pct_target"]}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
