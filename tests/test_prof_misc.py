"""Profiling utilities + FlagshipFused inside the Pipeline runtime."""

import numpy as np

import jax
import jax.numpy as jnp

import csdr_tpu as cs
from csdr_tpu.utils.prof import Meter, timed_steps
from csdr_tpu.core.runtime import Pipeline
from csdr_tpu.blocks.pallas_blocks import FlagshipFused


def test_meter():
    m = Meter("x")
    m.start()
    m.tick(1000)
    m.tick(1000)
    assert m.samples == 2000
    assert m.msps > 0
    assert "x:" in m.report()


def test_timed_steps():
    blk = cs.fm_demodulator(0.6)
    step = jax.jit(blk.apply)
    st = blk.init()
    x = jnp.ones((4096,), jnp.complex64)
    dt, st = timed_steps(step, st, x, iters=3)
    assert dt > 0


def test_flagship_fused_in_pipeline():
    nch, tileF = 8, 64
    blk = FlagshipFused(nch, kf=0.6, tileF=tileF, interpret=True)
    assert blk.granule == nch * tileF
    pipe = Pipeline(blk, block_size=nch * tileF * 2, donate=False)
    n = nch * tileF * 4
    rng = np.random.default_rng(0)
    iq = (0.1 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
    sink = cs.CollectSink()
    total = pipe.run(iter([iq]), sink)
    assert total == n // nch
    out = sink.concat()
    assert out.shape == (nch, n // nch)

    # equivalence with the XLA graph through the same runtime
    g = cs.chain(cs.dc_blocker(), cs.firpfbch_channelizer(nch),
                 cs.PerChannel(cs.fm_demodulator(0.6), nch))
    p2 = Pipeline(g, block_size=nch * tileF * 2, donate=False)
    s2 = cs.CollectSink()
    p2.run(iter([iq]), s2)
    want = s2.concat()
    assert np.max(np.abs(np.asarray(out)[:, 1:] - np.asarray(want)[:, 1:])) < 5e-4
