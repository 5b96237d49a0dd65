"""Graph-wrapper gap (round-4 weak #2): Block-graph scan path vs raw kernel.

PERF.md §2c recorded the f32-wide GRAPH path at 10.5 GSPS while the raw
kernel scan measured 13.4 (KERNEL_TILEF_F32_r04) — the per-iteration
decode_tree re-slicing of the (block, 2) CEnc input planes inside the scan
body.  bench.run_scan now hoists the decode to once per dispatch; this probe
pins the residual wrapper cost with adjacent scan pairs:

  A (raw):   flagship_fused_wide_step per scan iteration, complex input
             assembled ONCE per dispatch from f32 planes (the
             KERNEL_TILEF_F32 construction).
  B (graph): the channelized_fm_receiver("pallas_wide") Block graph through
             the CEnc boundary exactly as bench.run_scan builds it.

Done-criterion: median B/A >= 0.95.  Writes GRAPH_WRAP_<round>.json.

Usage: python benchmarks/probe_graph_wrap.py [rounds] [inner]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import bench  # noqa: E402

ROUND = os.environ.get("CSDR_ROUND", "r05")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.models.receivers import channelized_fm_receiver
    from csdr_tpu.core.runtime import encode_tree, decode_tree, CEnc
    from csdr_tpu.utils import autotune

    nch = 64
    block = bench._BLOCK
    tileF = autotune.lookup("flagship_fused_wide", nch)

    _mk_planes = jax.jit(lambda a, b: jnp.stack(
        [a.astype(jnp.float32) * (1 / 255.0),
         b.astype(jnp.float32) * (1 / 255.0)], axis=-1))

    def fresh_planes():
        """(block, 2) f32 CEnc planes with call-distinct content (relay
        dedup rule), derived from the shared fresh-u8 source."""
        r, i = bench.fresh_u8_pair(block)
        return _mk_planes(r, i)

    # ---- A: raw kernel scan, complex assembled once per dispatch ----
    def raw_chunk(state, probe, planes):
        xc = jax.lax.complex(planes[:, 0], planes[:, 1])
        def body(carry, _):
            st, pr = carry
            st2, y = flagship_fused_wide_step(st, xc, nch=nch, tileF=tileF)
            pr2 = y.reshape(-1)[0] + 0.0 * pr
            return (st2, pr2), None
        return jax.lax.scan(body, (state, probe), None, length=inner)[0]

    raw_step = jax.jit(raw_chunk, donate_argnums=(0,))

    # warm A
    s, p = raw_step(flagship_fused_wide_init(nch), bench.fresh_seed(),
                    fresh_planes())
    float(jax.device_get(p))

    def raw_timed():
        s, p = flagship_fused_wide_init(nch), bench.fresh_seed()
        x = fresh_planes()
        t0 = time.perf_counter()
        s, p = raw_step(s, p, x)
        float(jax.device_get(p))
        return inner * block / (time.perf_counter() - t0) / 1e6

    # ---- B: the Block graph through the CEnc boundary (bench.run_scan
    # construction: decode hoisted to once per dispatch) ----
    graph = channelized_fm_receiver(nch, kf=0.6, backend="pallas_wide",
                                    tileF=tileF)

    def graph_chunk(state_enc, probe, x_enc):
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

    graph_step = jax.jit(graph_chunk, donate_argnums=(0,))
    ginit = jax.jit(lambda: encode_tree(graph.init()))

    s, p = graph_step(ginit(), bench.fresh_seed(), CEnc(fresh_planes()))
    float(jax.device_get(p))

    def graph_timed():
        s, p = ginit(), bench.fresh_seed()
        x = CEnc(fresh_planes())
        t0 = time.perf_counter()
        s, p = graph_step(s, p, x)
        float(jax.device_get(p))
        return inner * block / (time.perf_counter() - t0) / 1e6

    pairs, ratios = [], []
    for r in range(rounds):
        a = raw_timed()
        b = graph_timed()
        ratios.append(b / a)
        pairs.append({"raw_msps": round(a, 1), "graph_msps": round(b, 1),
                      "ratio": round(b / a, 4)})
        print(f"# round {r}: raw {a:8.1f}  graph {b:8.1f}  ratio {b/a:.4f}",
              flush=True)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    rec = {"ts": time.time(), "tileF": tileF, "block": block, "inner": inner,
           "input": "f32_planes",
           "protocol": "adjacent scan pairs; complex assembly hoisted per "
                       "dispatch on BOTH sides; fresh content per dispatch; "
                       "download-terminated",
           "pairs": pairs, "ratio_median": round(med, 4),
           "meets_95pct": med >= 0.95,
           "healthy": all(r["raw_msps"] >= bench.HEALTHY_MSPS for r in pairs)}
    out = os.path.join(HERE, "results", f"GRAPH_WRAP_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "graph_wrap_ratio", "value": round(med, 4)}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
