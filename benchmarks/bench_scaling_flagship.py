"""Why ShardedFlagship has no virtual-mesh SCALING artifact — measured.

SCALING_r03/r04 measured the generic WBFM ShardedChain's structural
efficiency on virtual CPU devices (ceiling = N independent workers,
program = the sharded graph).  The natural round-5 follow-up — the same
ratio for ShardedFlagship, the production wide PALLAS kernel under the
mesh — turns out to be UNMEASURABLE off-chip, and this probe documents the
mechanism with numbers rather than leaving the gap unexplained:

  `pl.pallas_call(interpret=True)` nested inside `jax.shard_map` falls out
  of compiled execution into per-op evaluation for the WHOLE mapped
  program.  Measured here (CPU, nch=64, tileF=256, nloc=32768):

      serial kernel (jit, interpret)            ~1.5 ms / step
      same kernel inside a 1-device shard_map   ~413  ms / step   (~275x)
      full sharded program (pre-pass + colls)   ~509  ms / step

  Both sides of a ceiling/program ratio cannot be given the same tax (the
  independent-workers ceiling runs OUTSIDE shard_map by construction), and
  under per-op eval a ratio measures op COUNTS, not runtime structure — so
  any "efficiency" computed this way is junk and is deliberately NOT
  recorded as a SCALING artifact.

What stands instead (docs/SHARDING.md):
  * correctness of the sharded program on the virtual mesh: interpret-mode
    bit/float-floor equivalence vs the serial kernel across dt∈{1,2,4,8}
    (tests/test_sharded_flagship.py);
  * the sharded program's PRICE on real hardware: SHARDED_FLAGSHIP_r05
    measures wrapped 0.996 / full-program 0.933 of the raw kernel on chip
    — the number a pod deployment actually needs;
  * structural scaling of the XLA-path sharded graphs (no Pallas, so no
    interpret tax): SCALING_r04, 0.868/0.860 at n=2/4 scan-batched.

Running this script re-measures the three timings above and prints them as
one JSON line; it exists so the claim is reproducible, not to produce an
artifact.

Usage: [JAX_PLATFORMS=cpu] python benchmarks/bench_scaling_flagship.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    import jax

    if jax.devices()[0].platform != "cpu":
        import jax.extend.backend

        jax.extend.backend.clear_backends()
        jax.config.update("jax_num_cpu_devices", 1)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import Mesh
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)
    from csdr_tpu.parallel.flagship import ShardedFlagship

    nch, tileF = 64, 256
    nloc = nch * tileF * 2
    r = np.random.default_rng(0)
    planes = (r.integers(0, 256, nloc, np.uint8),
              r.integers(0, 256, nloc, np.uint8))

    def timed(step_fn, state, x, reps=3):
        state, y = step_fn(state, x)
        float(jax.device_get(jax.tree.leaves(y)[0].reshape(-1)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            state, y = step_fn(state, x)
        float(jax.device_get(jax.tree.leaves(y)[0].reshape(-1)[0]))
        return (time.perf_counter() - t0) / reps

    serial = jax.jit(lambda st, x: flagship_fused_wide_step(
        st, x, nch=nch, tileF=tileF, interpret=True))
    t_serial = timed(serial, flagship_fused_wide_init(nch),
                     tuple(jnp.asarray(p) for p in planes))

    def sharded(force):
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("time",))
        sf = ShardedFlagship(mesh, nch=nch, block_size=nloc, tileF=tileF,
                             interpret=True, force_full=force)
        x = tuple(jax.device_put(jnp.asarray(p), sf.input_sharding())
                  for p in planes)
        return timed(sf.step, sf.init(), x)

    t_wrapped = sharded(False)
    t_full = sharded(True)
    print(json.dumps({
        "metric": "interpret_in_shard_map_emulation_tax",
        "serial_ms": round(t_serial * 1e3, 2),
        "wrapped_1dev_shard_map_ms": round(t_wrapped * 1e3, 2),
        "full_program_ms": round(t_full * 1e3, 2),
        "tax_x": round(t_wrapped / t_serial, 1),
        "verdict": "virtual-mesh ceiling/program efficiency is not "
                   "measurable for Pallas programs (see module docstring); "
                   "on-chip price: SHARDED_FLAGSHIP_r05",
    }))


if __name__ == "__main__":
    main()
