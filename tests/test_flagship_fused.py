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


def test_flagship_fused_u8_input_matches_float_path():
    """cu8 (interleaved rtl_sdr uint8) planes converted INSIDE the kernel
    must match the float path fed the same converted samples."""
    rng = np.random.default_rng(1)
    nch, tileF = 8, 64
    n = nch * tileF * 4
    u8 = rng.integers(0, 256, 2 * n).astype(np.uint8)
    f = (u8.astype(np.float32) - 127.5) / np.float32(127.5)
    iq = (f[0::2] + 1j * f[1::2]).astype(np.complex64)

    st_f = flagship_fused_init(nch)
    st_u = flagship_fused_init(nch)
    half = n // 2
    for i in range(2):
        st_f, yf = flagship_fused_step(st_f, jnp.asarray(iq[i * half:(i + 1) * half]),
                                       nch=nch, tileF=tileF, interpret=True)
        st_u, yu = flagship_fused_step(st_u, jnp.asarray(u8[2 * i * half:2 * (i + 1) * half]),
                                       nch=nch, tileF=tileF, interpret=True)
        a, b = np.asarray(yf), np.asarray(yu)
        assert a.shape == b.shape
        # in-kernel v·(1/127.5)−1 vs host (v−127.5)/127.5: 1-ulp difference
        # amplified through the DC recurrence + atan2
        assert np.max(np.abs(a - b)) < 2e-4, np.max(np.abs(a - b))


def test_flagship_fused_u8_planes_matches_interleaved():
    rng = np.random.default_rng(2)
    nch, tileF = 8, 64
    n = nch * tileF * 2
    u8 = rng.integers(0, 256, 2 * n).astype(np.uint8)
    st_a = flagship_fused_init(nch)
    st_b = flagship_fused_init(nch)
    st_a, ya = flagship_fused_step(st_a, jnp.asarray(u8), nch=nch, tileF=tileF,
                                   interpret=True)
    st_b, yb = flagship_fused_step(
        st_b, (jnp.asarray(u8[0::2]), jnp.asarray(u8[1::2])),
        nch=nch, tileF=tileF, interpret=True)
    assert np.array_equal(np.asarray(ya), np.asarray(yb))


def test_narrow_splitn_bit_identical():
    """The narrow kernel's splitN default (round 4, mirrors the wide
    kernel) computes the exact same per-row arithmetic as the single
    chain — audio and state bit-identical across split1/default/split4."""
    import numpy as np
    import jax.numpy as jnp
    nch, tileF = 20, 64   # nch does NOT divide 64: the narrow-only case
    rng = np.random.default_rng(15)
    n = nch * tileF * 4
    t = np.arange(n)
    iq = (0.3 * np.exp(2j * np.pi * np.mod(0.213 * t, 1.0))
          + 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
          ).astype(np.complex64)
    outs, states = [], []
    for opts in (("split1",), (), ("split4",)):
        s = flagship_fused_init(nch)
        s, y = flagship_fused_step(s, jnp.asarray(iq), nch=nch, tileF=tileF,
                                   interpret=True, opts=opts)
        outs.append(np.asarray(y))
        states.append(s)
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])
    for k in ("hist_re", "hist_im", "scal"):
        assert np.array_equal(np.asarray(states[0][k]),
                              np.asarray(states[1][k])), k
