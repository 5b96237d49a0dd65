"""Fused halo exchange for runs of tail-state blocks (round-3 verdict,
weak #1 / next-round #2).

A chain of k default-protocol TailStateBlocks used to pay k ppermutes +
k psums per sharded step; Chain._shard_segments now plans one raw-input
context exchange per run (core/block.py).  These tests pin:

  * the segmentation rules (what fuses, what stays solo);
  * the collective COUNT in the compiled HLO (the actual claim);
  * stream equivalence vs the serial Pipeline across steps, including
    granule-tricky rate changers (halfband 2:1, rational P/Q, decimators,
    interpolators) and interior stateless stages;
  * fused runs inside PerChannel lanes;
  * the A1 > nloc static refusal.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import csdr_tpu as cs
from csdr_tpu.core.block import Chain, TailStateBlock
from csdr_tpu.core.runtime import Pipeline, decode_tree_host, _encode_host
from csdr_tpu.parallel.generic import ShardedChain


def mesh_of(dt, dc=1):
    if dt * dc > len(jax.devices()):
        pytest.skip("not enough devices")
    return Mesh(np.asarray(jax.devices()[:dt * dc]).reshape(dt, dc),
                ("time", "ch"))


def make_iq(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
    for f in (-0.29, -0.11, 0.07, 0.31):
        x += 0.35 * np.exp(2j * np.pi * np.mod(f * t, 1.0))
    return x.astype(np.complex64)


def stream_compare(graph, block, n_blocks, mesh, tol=2e-3, seed=0):
    iq = make_iq(n_blocks * block, seed)
    pipe = Pipeline(graph, block_size=block, donate=False)
    sh = ShardedChain(graph, mesh, block)
    state = sh.init()
    for b in range(n_blocks):
        xb = iq[b * block:(b + 1) * block]
        want = decode_tree_host(pipe.process_block(xb))
        state, y = sh.step(state, xb)
        got = decode_tree_host(y)
        for ga, wa in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            assert ga.shape == wa.shape, (ga.shape, wa.shape)
            scale = np.max(np.abs(wa)) + 1e-9
            err = np.max(np.abs(ga.astype(np.complex128)
                                - wa.astype(np.complex128))) / scale
            assert err < tol, (b, err)


# ---------------------------------------------------------------------------
# segmentation rules
# ---------------------------------------------------------------------------
def test_segments_fuse_tail_runs():
    g = cs.chain(cs.resampler(0.1), cs.fir_filter_c_kaiser(65, 0.2),
                 cs.fir_filter_c_kaiser(33, 0.3))
    segs = g._shard_segments()
    assert segs == [("fused", 0, len(g.blocks) - 1, segs[0][3])]
    assert segs[0][3] > 0


def test_segments_exclude_fm_demod_and_custom_shard_blocks():
    # FMDemod inits to ones (fuse_zero_tail=False) and DCBlocker/IIR have
    # custom shard_apply — none may join a run
    g = cs.chain(cs.fir_filter_c_kaiser(33, 0.2), cs.fm_demodulator(0.6),
                 cs.dc_blocker(complex_input=False))
    kinds = [s[0] for s in g._shard_segments()]
    assert kinds == ["solo", "solo", "solo"]


def test_segments_interior_stateless_joins_run():
    # fir >> Re >> fir: the stateless Lambda rides inside the run
    g = cs.chain(cs.fir_filter_c_kaiser(33, 0.2),
                 cs.Lambda(lambda x: x.real, name="re"),
                 cs.fir_filter(np.hanning(17) / 8.0, complex_input=False))
    segs = g._shard_segments()
    assert segs == [("fused", 0, 2, segs[0][3])]


def test_segments_single_tail_block_stays_solo():
    g = cs.chain(cs.fir_filter_c_kaiser(33, 0.2),
                 cs.fm_demodulator(0.6))
    assert [s[0] for s in g._shard_segments()] == ["solo", "solo"]


def test_plan_context_length_halfband_rational():
    # resampler(0.4) = halfband(h=49) >> rational 4/5 (g=5): backward plan
    # E2=0, A2=h2; E1 = ceil(A2/r1/g1)*g1; A1 = h1+E1 — checked by value
    g = cs.resampler(0.4)
    hb, rr = g.blocks
    segs = g._shard_segments()
    h2 = rr.tail_len
    E1 = -(-h2 * 2 // 2) * 2  # r1 = 1/2, g1 = 2
    assert segs == [("fused", 0, 1, hb.tail_len + E1)]


# ---------------------------------------------------------------------------
# the collective count — the actual claim of this optimization
# ---------------------------------------------------------------------------
def test_fused_run_compiles_to_one_permute_one_allreduce():
    mesh = mesh_of(4)
    g = cs.chain(cs.resampler(0.1), cs.fir_filter_c_kaiser(65, 0.2),
                 cs.fir_filter_c_kaiser(33, 0.3))
    assert len(g.blocks) == 6 and g._shard_segments()[0][0] == "fused"
    block = 4 * g.granule * max(1, 4096 // g.granule)
    sh = ShardedChain(g, mesh, block)
    x = make_iq(block)
    st = sh.init()
    hlo = sh._step.lower(st, _encode_host(x)).compile().as_text()
    assert hlo.count("collective-permute(") == 1, hlo.count("collective-permute(")
    assert hlo.count("all-reduce(") == 1, hlo.count("all-reduce(")


# ---------------------------------------------------------------------------
# stream equivalence vs serial
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dt", [2, 4, 8])
def test_fused_resampler_chain_matches_serial(dt):
    mesh = mesh_of(dt)
    g = cs.chain(cs.resampler(0.1), cs.fir_filter_c_kaiser(65, 0.2),
                 cs.fir_filter_c_kaiser(33, 0.3))
    block = dt * g.granule * max(1, 4096 // g.granule)
    stream_compare(g, block, 3, mesh, tol=1e-5)


def test_fused_mixed_rates_interp_decim():
    # interpolator (rate 3) >> fir >> decimator (1/4) >> halfband: exercises
    # g-aligned trimming with both up- and down-raters in one run
    mesh = mesh_of(4)
    from csdr_tpu.blocks import FIRDecim, HalfbandDecim
    g = cs.chain(cs.fir_interpolator(3), cs.fir_filter_c_kaiser(33, 0.2),
                 FIRDecim(4, complex_input=True),
                 HalfbandDecim(complex_input=True))
    assert g._shard_segments()[0][0] == "fused"
    block = 4 * g.granule * max(1, 2048 // g.granule)
    stream_compare(g, block, 3, mesh, tol=1e-5)


def test_fused_interior_stateless_matches_serial():
    mesh = mesh_of(4)
    g = cs.chain(cs.fir_filter_c_kaiser(33, 0.2),
                 cs.Lambda(lambda x: x.real, name="re"),
                 cs.fir_filter(np.hanning(17) / 8.0, complex_input=False))
    stream_compare(g, 4 * 4096, 3, mesh, tol=1e-5)


def test_fused_run_inside_perchannel():
    mesh = mesh_of(2, 2)
    nch = 8
    per = cs.chain(cs.fir_filter_c_kaiser(17, 0.3),
                   cs.fir_filter_c_kaiser(9, 0.4))
    assert per._shard_segments()[0][0] == "fused"
    g = cs.chain(cs.firpfbch_channelizer(nch), cs.PerChannel(per, nch))
    block = 2 * nch * 256
    stream_compare(g, block, 3, mesh, tol=1e-5)


def test_fused_run_refuses_short_segment():
    mesh = mesh_of(8)
    g = cs.chain(cs.fir_filter_c_kaiser(513, 0.1),
                 cs.fir_filter_c_kaiser(513, 0.12))
    assert g._shard_segments()[0][0] == "fused"
    with pytest.raises(ValueError, match="fused run"):
        ShardedChain(g, mesh, 8 * 512)  # nloc=512 < A1≈1024


def test_shard_init_structure():
    g = cs.chain(cs.resampler(0.4), cs.fm_demodulator(0.6))
    segs = g._shard_segments()
    (kind, i0, j, A1) = segs[0]
    assert kind == "fused"
    st = g.shard_init()
    assert st[i0].shape == (A1,) and st[i0].dtype == np.complex64
    assert st[i0 + 1] == ()
    # solo FMDemod keeps its serial init (ones)
    assert np.asarray(st[j + 1]).dtype == np.complex64
