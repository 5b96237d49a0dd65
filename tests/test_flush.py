"""End-of-stream flush semantics (reference fold `done`, Trans.hs:86-104).

Blocks that withhold samples (Delay's buffer, StereoFMDecoder's group-delay
line) declare a ``flush_len`` zero-fill allowance; Pipeline.run /
ShardedPipeline.run feed it after the source ends so the withheld samples
are emitted and the byte accounting is exact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import csdr_tpu as cs
from csdr_tpu.core.runtime import Pipeline
from csdr_tpu.models.stereo import StereoFMDecoder
from csdr_tpu.utils import testsig


class _Collect:
    def __init__(self):
        self.parts = []

    def __call__(self, y):
        self.parts.append(y)


def test_delay_flush_completes_delayed_branch():
    """With flush, each Delay branch carries exactly N+n samples: the live
    branch is input+zeros, the delayed branch is zeros+input — every input
    sample appears exactly once in each branch."""
    n, N = 7, 1000
    x = np.random.default_rng(0).normal(size=N).astype(np.float32)
    pipe = Pipeline(cs.chain(cs.Delay(n)), block_size=256)
    sink = _Collect()
    total = pipe.run(iter([x]), sink)
    live = np.concatenate([p[0] for p in sink.parts])
    delayed = np.concatenate([p[1] for p in sink.parts])
    assert total == N + n
    assert live.shape == delayed.shape == (N + n,)
    assert np.array_equal(live, np.concatenate([x, np.zeros(n, np.float32)]))
    assert np.array_equal(delayed, np.concatenate([np.zeros(n, np.float32), x]))


def test_flush_is_noop_for_causal_graphs():
    g = cs.chain(cs.dc_blocker(), cs.fm_demodulator(0.6))
    assert g.flush_len() == 0
    x = testsig.tone(4096, 0.05)
    pipe = Pipeline(g, block_size=1024)
    s1, s2 = _Collect(), _Collect()
    assert pipe.run(iter([x]), s1, flush=True) == 4096
    pipe.reset()
    assert pipe.run(iter([x]), s2, flush=False) == 4096
    assert np.array_equal(np.concatenate(s1.parts), np.concatenate(s2.parts))


def test_chain_flush_len_scales_by_rate_prefix():
    """A Delay downstream of a 1/4 decimator needs 4x the zero-fill at the
    chain input."""
    dec = cs.fir_decimator(4)
    g = cs.chain(dec, cs.Delay(5))
    assert g.flush_len() == 20
    g2 = cs.chain(cs.Delay(5), dec)
    assert g2.flush_len() == 5


def test_stereo_flush_exact_count_and_tail_content():
    """The flushed stereo run emits exactly (N+flush)/decim frames, and its
    output equals an unflushed run over the explicitly zero-padded input —
    the flush is ordinary streaming math, not a special path."""
    quad, decim = 192000.0, 4
    N = 1 << 15
    t = np.arange(N) / quad
    L = 0.5 * np.sin(2 * np.pi * 800.0 * t)
    R = 0.5 * np.sin(2 * np.pi * 2000.0 * t)
    pilot = 0.1 * np.cos(2 * np.pi * 19000.0 * t)
    mpx = (0.45 * (L + R) + pilot
           + 0.45 * (L - R) * np.cos(2 * np.pi * 38000.0 * t)).astype(np.float32)

    dec = StereoFMDecoder(quad, decim)
    nf = dec.flush_len()
    assert nf >= dec.gdelay and nf % decim == 0

    pipe = Pipeline(cs.chain(StereoFMDecoder(quad, decim)), block_size=4096)
    sink = _Collect()
    total = pipe.run(iter([mpx]), sink)
    assert total == (N + nf) // decim
    flushed = np.concatenate([p for p in sink.parts], axis=-1)

    pipe2 = Pipeline(cs.chain(StereoFMDecoder(quad, decim)), block_size=4096)
    sink2 = _Collect()
    padded = np.concatenate([mpx, np.zeros(nf, np.float32)])
    pipe2.run(iter([padded]), sink2, flush=False)
    ref = np.concatenate([p for p in sink2.parts], axis=-1)
    assert flushed.shape == ref.shape == (2, (N + nf) // decim)
    assert np.array_equal(flushed, ref)


@pytest.mark.parametrize("dt", [2, 4])
def test_sharded_flush_matches_serial(dt):
    """ShardedPipeline.run's flush produces byte-identical output to the
    serial Pipeline's."""
    import jax
    from jax.sharding import Mesh
    from csdr_tpu.parallel.generic import ShardedChain
    from csdr_tpu.parallel.runner import ShardedPipeline

    quad, decim = 192000.0, 4
    N = 1 << 15
    rng = np.random.default_rng(3)
    mpx = rng.normal(scale=0.2, size=N).astype(np.float32)

    block = 8192
    g1 = cs.chain(StereoFMDecoder(quad, decim))
    pipe = Pipeline(g1, block_size=block)
    s_ser = _Collect()
    tot_ser = pipe.run(iter([mpx]), s_ser)

    mesh = Mesh(np.array(jax.devices("cpu")[:dt]).reshape(dt, 1), ("time", "ch"))
    sc = ShardedChain(cs.chain(StereoFMDecoder(quad, decim)), mesh, block)
    s_mesh = _Collect()
    tot_mesh = ShardedPipeline(sc).run(iter([mpx]), s_mesh)
    assert tot_ser == tot_mesh
    a = np.concatenate([np.asarray(p) for p in s_ser.parts], axis=-1)
    b = np.concatenate([np.asarray(p) for p in s_mesh.parts], axis=-1)
    assert a.shape == b.shape
    assert np.allclose(a, b, atol=2e-5)
