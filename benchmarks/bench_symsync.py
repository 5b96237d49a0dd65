"""Symbol-sync throughput: block-parallel estimator vs closed-loop scan.

VERDICT round-1 #6 asked for the scan mode to be benchmarked: it is a serial
lax.scan per output tick (liquid-faithful dynamics) and is expected to be
orders of magnitude slower than the block-parallel path — this script
quantifies the gap so users know what choosing mode="scan" costs.

    python benchmarks/bench_symsync.py [--k 4] [--nsym 65536] [--reps 5]

Prints one JSON line per mode with MSPS (input samples/s).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from csdr_tpu.core.runtime import encode_tree, decode_tree, _encode_host
from csdr_tpu.models.symsync import sym_sync_c
from csdr_tpu.models import modem
from csdr_tpu.utils import firdes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--nsym", type=int, default=262144,
                    help="symbols per rep; block mode is dispatch-latency-"
                         "bound below ~1M samples on the relay-tunneled chip")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None,
                    help="write results JSON (e.g. results/SYMSYNC_r02.json)")
    args = ap.parse_args()

    k, m = args.k, 3
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, args.nsym * 2)
    syms = modem.modulate(bits, "qpsk").astype(np.complex128)
    h = firdes.rrc(k, m, 0.5)
    up = np.zeros(args.nsym * k, dtype=np.complex128)
    up[::k] = syms
    x = np.convolve(up, h)[: args.nsym * k].astype(np.complex64)
    n = len(x)

    out = []
    for mode in ("block", "scan"):
        blk = sym_sync_c(m, k, 0.5, 32, mode=mode)
        # complex-free jit boundary (core/runtime.CEnc): this TPU backend
        # cannot transfer complex64 or run eager complex ops — same wrapping
        # Pipeline/entry() use (docs/TPU_BACKEND_NOTES.md)
        state = jax.jit(lambda: encode_tree(blk.init()))()

        def _step(s_enc, x_enc):
            s2, y = blk.apply(decode_tree(s_enc), decode_tree(x_enc))
            return encode_tree(s2), encode_tree(y)

        step = jax.jit(_step)
        xd = _encode_host(x)
        state0 = state
        state, y = step(state, xd)  # compile

        def _force(y):
            leaf = jax.tree.leaves(y)[0]
            arr = leaf.ri if hasattr(leaf, "ri") else leaf
            return float(jax.device_get(arr.reshape(-1)[0]))

        _force(y)
        # two-point slope, download-terminated (the relay can ack
        # block_until_ready without executing — docs/TPU_BACKEND_NOTES.md);
        # the state chain makes the final output depend on every rep
        times = []
        for n_reps in (args.reps, 4 * args.reps):
            best = float("inf")
            for _ in range(2):
                st = state0
                t0 = time.perf_counter()
                for _ in range(n_reps):
                    st, y = step(st, xd)
                _force(y)
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        dt = (times[1] - times[0]) / (3 * args.reps)
        r = {"mode": mode, "msps": round(n / dt / 1e6, 3),
             "n": n, "k": k}
        out.append(r)
        print(json.dumps(r))
    if len(out) == 2:
        print(json.dumps({"block_over_scan_speedup":
                          round(out[0]["msps"] / out[1]["msps"], 1)}))
    if args.out and out:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out) \
            if not os.path.isabs(args.out) else args.out
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"nsym": args.nsym, "k": args.k, "reps": args.reps,
                       "results": out,
                       "platform": jax.default_backend(),
                       "device_kind": jax.devices()[0].device_kind}, f, indent=1)
        print(f"# wrote {path}")


if __name__ == "__main__":
    main()
