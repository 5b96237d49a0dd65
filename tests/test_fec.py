"""Convolutional FEC (ops/fec.py): encoder spec pins, Viterbi inverse,
coding gain, alternative codes."""

from __future__ import annotations

import numpy as np
import pytest

from csdr_tpu.ops import fec


def test_encoder_impulse_response_pins_polynomials():
    """The encoder's impulse response IS the generator taps: for message
    [1,0,0,...] the t-th output of generator g is bit t of g (delay-t tap),
    so the (171,133)₈ spec is pinned bit-for-bit."""
    out = fec.conv_encode(np.asarray([1, 0, 0, 0, 0, 0, 0]), tail=False)
    pairs = out.reshape(-1, 2)
    for gi, g in enumerate(fec.CCSDS_POLYS):
        want = [(g >> t) & 1 for t in range(7)]
        assert pairs[:, gi].tolist() == want, (oct(g), pairs[:, gi])


def test_noiseless_roundtrip():
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, 400)
    coded = fec.conv_encode(msg)
    llr = 1.0 - 2.0 * coded.astype(np.float64)
    dec = np.asarray(fec.viterbi_decode(llr))
    assert np.array_equal(dec, msg)


def test_hard_errors_corrected():
    """Scattered hard bit flips well under the d_free/2 guarantee per
    constraint span are fully corrected."""
    rng = np.random.default_rng(2)
    msg = rng.integers(0, 2, 600)
    coded = fec.conv_encode(msg).astype(np.float64)
    llr = 1.0 - 2.0 * coded
    flip = rng.choice(len(llr), size=len(llr) // 50, replace=False)
    llr[flip] *= -1.0
    dec = np.asarray(fec.viterbi_decode(llr))
    assert np.array_equal(dec, msg)


def test_coding_gain_at_low_snr():
    """Soft-decision K=7 r=1/2 at 0 dB Es/N0: coded BER must sit orders
    below the ~8% uncoded channel BER (measured 3e-4 here)."""
    ber, uncoded = fec.coded_ber(20000, 0.0, seed=1)
    assert uncoded > 0.05
    assert ber < 0.005, (ber, uncoded)


def test_rate_third_and_k9():
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, 300)
    # rate-1/3 K=7 and the K=9 (561, 753) pair both invert cleanly
    for polys, K in (((0o171, 0o133, 0o145), 7), ((0o561, 0o753), 9)):
        coded = fec.conv_encode(msg, polys, K)
        llr = 1.0 - 2.0 * coded.astype(np.float64)
        dec = np.asarray(fec.viterbi_decode(llr, polys, K))
        assert np.array_equal(dec, msg), (polys, K)


def test_untailed_mode():
    rng = np.random.default_rng(4)
    msg = rng.integers(0, 2, 256)
    coded = fec.conv_encode(msg, tail=False)
    llr = 1.0 - 2.0 * coded.astype(np.float64)
    dec = np.asarray(fec.viterbi_decode(llr, tail=False))
    assert len(dec) == len(msg)
    # without the tail the last few bits are unprotected; the body must match
    assert np.array_equal(dec[:-8], msg[:-8])


def test_jit_and_soft_llr_integration():
    """viterbi_decode composes with models/modem soft LLRs under jit."""
    import jax
    from csdr_tpu.models import modem

    rng = np.random.default_rng(5)
    msg = rng.integers(0, 2, 200)
    coded = fec.conv_encode(msg)
    sym = modem.modulate(coded, "qpsk")
    noisy = sym + 0.05 * (rng.normal(size=len(sym))
                          + 1j * rng.normal(size=len(sym)))
    llr = np.asarray(modem.soft_llrs(noisy, "qpsk", noise_var=0.005)
                     ).reshape(-1)
    dec = np.asarray(jax.jit(
        lambda v: fec.viterbi_decode(v))(llr.astype(np.float32)))
    assert np.array_equal(dec, msg)
