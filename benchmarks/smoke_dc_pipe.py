"""On-chip Mosaic compile + bit-identity smoke for the dc_pipe gate.

Interpret-mode tests prove dc_pipe's algebra (tests/test_flagship_fused_wide
::test_dc_pipe_bit_identical); this script proves the variant COMPILES under
Mosaic on the real chip (second input BlockSpec with a clamped i+1 index
map, predicated DC region, ydc scratch) and that on-chip audio matches
production exactly, without pulling panels to host (a single scalar
download ends the check)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from csdr_tpu.ops.pallas.flagship_fused_wide import (
        flagship_fused_wide_init, flagship_fused_wide_step)

    nch, tileF = 64, 1024
    blocks, T = 2, 4
    n = nch * tileF * T

    @jax.jit
    def mk(seed):
        k = jax.random.split(jax.random.PRNGKey(seed))[0]
        u = jax.random.randint(k, (2 * n,), 0, 256, jnp.int32).astype(jnp.uint8)
        return u[:n], u[n:]

    worst = 0.0
    sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
    for i in range(blocks):
        x = mk(i)
        sa, ya = flagship_fused_wide_step(sa, x, nch=nch, tileF=tileF)
        sb, yb = flagship_fused_wide_step(sb, x, nch=nch, tileF=tileF,
                                          opts=("dc_pipe",))
        d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(ya, yb)
        worst = max(worst, float(jax.device_get(d)))
        print(f"# block {i}: max |prod - dc_pipe| = {worst}", flush=True)
    for k in ("hist_re", "hist_im", "scal"):
        d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(sa[k], sb[k])
        worst = max(worst, float(jax.device_get(d)))
    print({"dc_pipe_smoke_max_abs_diff": worst,
           "ok": worst == 0.0})


if __name__ == "__main__":
    main()
