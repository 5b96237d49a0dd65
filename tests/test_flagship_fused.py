"""Fully-fused flagship kernel vs the XLA block path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

import csdr_tpu as cs
from csdr_tpu.ops.pallas.flagship_fused import flagship_fused_init, flagship_fused_step


def xla_reference(iq, nch, blocks):
    g = cs.chain(cs.dc_blocker(), cs.firpfbch_channelizer(nch),
                 cs.PerChannel(cs.fm_demodulator(0.6), nch))
    st = g.init()
    outs = []
    n = len(iq) // blocks
    for i in range(blocks):
        st, y = g.apply(st, jnp.asarray(iq[i * n:(i + 1) * n]))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("nch,tileF", [(8, 64), (16, 128)])
def test_flagship_fused_matches_xla(nch, tileF):
    rng = np.random.default_rng(0)
    n = nch * tileF * 4
    t = np.arange(n)
    iq = (0.3 * np.exp(2j * np.pi * np.mod(0.213 * t, 1.0))
          + 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)

    want = xla_reference(iq, nch, blocks=2)

    st = flagship_fused_init(nch)
    outs = []
    half = n // 2
    for i in range(2):
        st, y = flagship_fused_step(st, jnp.asarray(iq[i * half:(i + 1) * half]),
                                    nch=nch, tileF=tileF, interpret=True)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)

    assert got.shape == want.shape
    err = np.max(np.abs(got[:, 1:] - want[:, 1:]))  # frame 0: demod seed differs
    assert err < 5e-4, err
