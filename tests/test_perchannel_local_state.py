"""Channel-local PerChannel state (round-3 verdict, weak #5 / next #8).

Under ShardedChain, PerChannel's stacked per-channel states are sharded
over the 'ch' mesh axis (Block.shard_state_spec) instead of replicated —
each device carries and updates only its own channels' states, eliminating
the per-step O(nch·state) all-gather the round-3 implementation paid.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import csdr_tpu as cs
from csdr_tpu.core.runtime import Pipeline, decode_tree_host, _encode_host
from csdr_tpu.parallel.generic import ShardedChain


def mesh_of(dt, dc):
    if dt * dc > len(jax.devices()):
        pytest.skip("not enough devices")
    return Mesh(np.asarray(jax.devices()[:dt * dc]).reshape(dt, dc),
                ("time", "ch"))


def make_iq(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
    for f in (-0.29, 0.07, 0.31):
        x += 0.35 * np.exp(2j * np.pi * np.mod(f * t, 1.0))
    return x.astype(np.complex64)


def _graph(nch):
    per = cs.chain(cs.automatic_gain_control(-40.0), cs.fm_demodulator(0.6),
                   cs.fir_decimator(2))
    return cs.chain(cs.firpfbch_channelizer(nch), cs.PerChannel(per, nch))


def test_no_state_allgather_in_hlo():
    """PerChannel(FMDemod) has no recurrence collectives of its own, so the
    compiled sharded step must contain ZERO all-gathers once the stacked
    state stops being replicated (the r03 build had one per step)."""
    mesh = mesh_of(2, 4)
    nch = 8
    g = cs.chain(cs.firpfbch_channelizer(nch),
                 cs.PerChannel(cs.fm_demodulator(0.6), nch))
    block = 2 * nch * 256
    sh = ShardedChain(g, mesh, block)
    st = sh.init()
    hlo = sh._step.lower(st, _encode_host(make_iq(block))).compile().as_text()
    assert hlo.count("all-gather(") == 0, hlo.count("all-gather(")


def test_state_actually_channel_sharded():
    mesh = mesh_of(2, 4)
    nch = 8
    sh = ShardedChain(_graph(nch), mesh, 2 * nch * 256)
    st = sh.init()
    # PerChannel is blocks[1]; its state leaves must be sharded over 'ch'
    pc_state = st[1]
    leaves = jax.tree.leaves(pc_state)
    assert leaves, "PerChannel state empty?"
    for leaf in leaves:
        arr = leaf.ri if hasattr(leaf, "ri") else leaf
        spec = arr.sharding.spec
        assert spec and spec[0] == "ch", (arr.shape, spec)


@pytest.mark.parametrize("dt,dc", [(2, 4), (4, 2), (1, 8)])
def test_stateful_perchannel_matches_serial_streaming(dt, dc):
    """AGC + FM demod + decimator per channel: channel-local state must
    stream identically to the serial Pipeline across blocks."""
    mesh = mesh_of(dt, dc)
    nch = 8
    g = _graph(nch)
    block = dt * nch * 256
    n_blocks = 3
    iq = make_iq(n_blocks * block, seed=4)
    pipe = Pipeline(g, block_size=block, donate=False)
    sh = ShardedChain(g, mesh, block)
    st = sh.init()
    for b in range(n_blocks):
        xb = iq[b * block:(b + 1) * block]
        want = decode_tree_host(pipe.process_block(xb))
        st, y = sh.step(st, xb)
        got = decode_tree_host(y)
        scale = np.max(np.abs(want)) + 1e-9
        err = np.max(np.abs(got - want)) / scale
        assert err < 2e-3, (b, err)
