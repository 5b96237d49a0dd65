"""On-chip throughput of the vectorized-trellis Viterbi (ops/fec.py).

The decoder's ACS recursion is a lax.scan whose per-step work is one
(2, S) gather + add + max across all 2^(K-1) states; per-packet work is
sequential in symbols, so TPU throughput comes from BATCH parallelism —
`jax.vmap` over packets turns the trellis into (B, 2, S) panels the VPU
chews through.  This probe measures decoded Mbit/s for K=7 rate-1/2 at
several batch sizes with the repo's honest protocol: iteration i+1
consumes iteration i's output (the LLR sign panel is re-derived from the
previous decode), every timed region ends with a 4-byte download, and the
two-point slope cancels the dispatch intercept (CLAUDE.md rule 6).

Writes benchmarks/results/FEC_<round>.json.

Usage: python benchmarks/bench_fec.py [msg_bits] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

ROUND = os.environ.get("CSDR_ROUND", "r05")


def main():
    msg_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import numpy as np
    import jax
    import jax.numpy as jnp
    from csdr_tpu.ops import fec

    rng = np.random.default_rng(0)
    rows = []
    for batch in (1, 8, 64, 256):
        msgs = rng.integers(0, 2, (batch, msg_bits))
        llr0 = np.stack([1.0 - 2.0 * fec.conv_encode(m) for m in msgs]
                        ).astype(np.float32)

        dec1 = jax.vmap(lambda v: fec.viterbi_decode(v))

        def chained(llr, probe):
            bits = dec1(llr)
            # anti-dedup chain: flip the LLR signs where the decoded bits
            # came out 1 re-encoded — a data-dependent, value-changing
            # transform (the relay replays byte-identical dispatches)
            tweak = (bits[:, :1].astype(jnp.float32) - 0.5) * 1e-3
            nxt = llr * (1.0 + 0.0 * tweak) + tweak
            pr = bits[0, 0].astype(jnp.float32) + 0.0 * probe
            return nxt, pr

        step = jax.jit(chained)
        llr, pr = step(jnp.asarray(llr0), jnp.float32(0))
        float(jax.device_get(pr))              # warm + force

        def run_n(n):
            nonlocal llr
            p = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(n):
                llr, p = step(llr, p)
            float(jax.device_get(p))
            return time.perf_counter() - t0

        # median of per-rep slopes, POSITIVE slopes only: a relay hiccup
        # during the short run inflates tA and can collapse the slope
        # toward zero (or below), which max() would commit as an
        # arbitrarily inflated artifact value — the same failure mode the
        # ladder probes defend against with medians (docs/PERF.md §4)
        vals = []
        for _ in range(reps):
            tA = run_n(2)
            tB = run_n(8)
            slope = (tB - tA) / 6.0            # s per iteration
            if slope > 0:
                vals.append(batch * msg_bits / slope / 1e6)
        vals.sort()
        med = vals[len(vals) // 2] if vals else 0.0
        rows.append({"batch": batch, "msg_bits": msg_bits,
                     "decoded_Mbps": round(med, 2),
                     "reps_kept": len(vals), "reps": reps})
        print(f"# batch {batch:4d}: {med:10.2f} Mbit/s decoded "
              f"({len(vals)}/{reps} reps usable)", flush=True)

    rec = {"ts": time.time(), "K": 7, "rate": "1/2",
           "protocol": "two-point slope (2 vs 8 chained dispatches), "
                       "data-dependent LLR chain, download-terminated",
           "rows": rows,
           "healthy": rows[-1]["decoded_Mbps"] > rows[0]["decoded_Mbps"]}
    out = os.path.join(HERE, "results", f"FEC_{ROUND}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "viterbi_decoded_Mbps_batch256",
                      "value": rows[-1]["decoded_Mbps"]}))
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
