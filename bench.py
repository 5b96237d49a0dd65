"""Headline benchmark: 64-channel PFB channelize + per-channel FM demod
throughput on one chip (BASELINE.json metric: Msamples/s/chip).

Baseline: the reference sustains ~1.6-3.2 MSPS end-to-end through a 20-channel
channelizer pipeline on a desktop CPU core (README.md:182-195); the north-star
bar is >10x => 32 MSPS/chip.  vs_baseline is measured against 3.2 MSPS.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from csdr_tpu.models.receivers import channelized_fm_receiver

    nch = 64
    block = 1 << 21  # 2 Msamples per step
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    graph = channelized_fm_receiver(nch, kf=0.6)
    step = jax.jit(graph.apply, donate_argnums=(0,))
    state = graph.init()

    rng = np.random.default_rng(0)
    t = np.arange(block)
    host_x = (0.5 * np.exp(2j * np.pi * np.mod(0.1237 * t, 1.0))
              + 0.05 * (rng.normal(size=block) + 1j * rng.normal(size=block))
              ).astype(np.complex64)
    x = jnp.asarray(host_x)

    # warmup / compile
    state, y = step(state, x)
    jax.block_until_ready(y)
    state, y = step(state, x)
    jax.block_until_ready(y)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, y = step(state, x)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0

    msps = iters * block / dt / 1e6
    baseline_msps = 3.2
    print(json.dumps({
        "metric": "pfb64_fm_demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline_msps, 2),
    }))


if __name__ == "__main__":
    main()
