"""Channelizer-only fused kernel vs ops/pfb (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from csdr_tpu.ops.pfb import pfb_analyze_init, pfb_analyze_stream, pfb_taps, pfb_dft_matrix
from csdr_tpu.ops.pallas.pfb_fused import pfb_channelize_fused


def test_channelize_fused_matches_xla():
    nch, m = 8, 7
    L = 2 * m
    F = 256
    rng = np.random.default_rng(0)
    xs = (rng.normal(size=F * nch) + 1j * rng.normal(size=F * nch)).astype(np.complex64)

    # XLA reference (no NCO pre-shift — operate on the already-shifted signal)
    st = pfb_analyze_init(nch, m)
    st, want = pfb_analyze_stream(st, jnp.asarray(xs), nch, m)
    want = np.asarray(want)  # (nch, F)

    # fused: same panel construction as pfb_analyze_stream
    hist_x = jnp.zeros((nch - 1,), jnp.complex64)
    hist_v = jnp.zeros((L - 1, nch), jnp.complex64)
    xfull = jnp.concatenate([hist_x, jnp.asarray(xs)])
    v = xfull[: F * nch].reshape(F, nch)[:, ::-1]
    vfull = jnp.concatenate([hist_v, v], axis=0)
    taps = jnp.asarray(pfb_taps(nch, m))
    W = pfb_dft_matrix(nch)
    dre, dim = pfb_channelize_fused(
        jnp.real(vfull), jnp.imag(vfull), taps,
        jnp.asarray(W.real.astype(np.float32)), jnp.asarray(W.imag.astype(np.float32)),
        nch=nch, L=L, tileF=64, interpret=True)
    got = (np.asarray(dre) + 1j * np.asarray(dim)).T  # (nch, F)

    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 2e-3  # bf16_3x DFT split
