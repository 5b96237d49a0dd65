"""PFB channelizer, rational resampler, Hilbert converter — oracle tests."""

import numpy as np
import pytest
import scipy.signal as sig

import jax.numpy as jnp

from csdr_tpu.ops.pfb import (
    pfb_analyze_init,
    pfb_analyze_stream,
    pfb_offset,
    pfb_taps,
)
from csdr_tpu.ops.nco import mix_stream
from csdr_tpu.ops.resamp import (
    rational_approx,
    rational_resample_init,
    rational_resample_stream,
    rational_taps,
)
from csdr_tpu.ops.hilbert import (
    real_to_complex_init,
    real_to_complex_stream,
    complex_to_real_init,
    complex_to_real_stream,
)
from csdr_tpu.utils import testsig


def channelize(x, nch, m=7, blocks=4):
    """Run the full reference pre-shift + PFB over ``blocks`` chunks."""
    n = len(x) // blocks
    phase = jnp.zeros((), jnp.float32)
    state = pfb_analyze_init(nch, m)
    outs = []
    for i in range(blocks):
        chunk = jnp.asarray(x[i * n:(i + 1) * n])
        phase, shifted = mix_stream(phase, chunk, pfb_offset(nch), up=False)
        state, y = pfb_analyze_stream(state, shifted, nch, m)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=1)  # (nch, F_total)


@pytest.mark.parametrize("nch", [4, 8])
def test_pfb_tone_lands_in_expected_channel(nch):
    # tone at the center of channel k: f_k = (k - (nch-1)/2)/nch  (cycles/sample)
    n = nch * 4096
    for k in (0, 1, nch // 2, nch - 1):
        f = (k - (nch - 1) / 2.0) / nch
        x = testsig.tone(n, f)
        y = channelize(x, nch)
        power = np.mean(np.abs(y) ** 2, axis=1)
        assert np.argmax(power) == k, (k, power)
        # selectivity: dominant channel carries ~all the energy
        assert power[k] / (np.sum(power) - power[k] + 1e-12) > 100.0
        # unity gain: tone amplitude preserved in its channel
        assert abs(np.sqrt(power[k]) - 1.0) < 0.05


def test_pfb_streaming_consistency():
    nch = 8
    rng = np.random.default_rng(0)
    n = nch * 2048
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    one = channelize(x, nch, blocks=1)
    four = channelize(x, nch, blocks=4)
    assert np.max(np.abs(one - four)) < 1e-4


def test_pfb_matches_direct_filterbank_oracle():
    """Channel k must equal decimate(lowpass(x·e^{-jω_k n})) for the same
    prototype (float64 oracle)."""
    nch, m = 4, 7
    rng = np.random.default_rng(1)
    n = nch * 1024
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    y = channelize(x, nch, m=m, blocks=1)

    taps = pfb_taps(nch, m)  # (L, nch); prototype h[l·nch + p] = taps[l, p]
    proto = np.zeros(taps.shape[0] * nch)
    for p in range(nch):
        proto[p::nch] = taps[:, p]

    t = np.arange(n)
    xs = x * np.exp(-1j * (pfb_offset(nch) * t))  # mix_down pre-shift
    for k in range(nch):
        wk = 2 * np.pi * k / nch
        lp = sig.lfilter(proto, [1.0], xs * np.exp(-1j * wk * t))
        want = lp[::nch]
        got = y[k]
        err = np.max(np.abs(got - want[: got.shape[0]]))
        assert err < 5e-3, (k, err)


@pytest.mark.parametrize("P,Q", [(5, 8), (1, 2), (2, 3), (4, 3)])
def test_rational_resampler_tone(P, Q):
    """A tone resampled by P/Q must come out at frequency f·Q/P of the new
    rate with ~unity amplitude."""
    f = 0.02
    n = 1024 * Q
    x = testsig.tone(n, f)
    state = rational_resample_init(P, Q)
    outs = []
    for i in range(0, n, n // 4):
        state, y = rational_resample_stream(state, jnp.asarray(x[i:i + n // 4]), P, Q)
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    assert len(y) == n * P // Q
    L = rational_taps(P, Q).shape[1]
    settle = 4 * L
    yy = y[settle:]
    t = np.arange(settle, len(y))
    want = np.exp(1j * 2 * np.pi * (f * Q / P) * t)
    # compare against ideal resampled tone (allow constant phase offset)
    g = np.vdot(want, yy) / np.vdot(want, want)
    assert abs(abs(g) - 1.0) < 0.03, g
    err = np.max(np.abs(yy - g * want))
    assert err < 0.05


def test_rational_resampler_awkward_rate_gather_path():
    """A rate whose rational approximation has large P exercises the gather
    formulation (P·L too big to unroll)."""
    from fractions import Fraction
    fr = rational_approx(0.789123)
    P, Q = fr.numerator, fr.denominator
    assert P * rational_taps(P, Q).shape[1] > 2048  # really the gather path
    f = 0.01
    n = 512 * Q
    x = testsig.tone(n, f)
    state = rational_resample_init(P, Q)
    state, y = rational_resample_stream(state, jnp.asarray(x), P, Q)
    y = np.asarray(y)
    assert len(y) == n * P // Q
    L = rational_taps(P, Q).shape[1]
    t = np.arange(4 * L, len(y))
    want = np.exp(1j * 2 * np.pi * (f * Q / P) * t)
    yy = y[4 * L:]
    g = np.vdot(want, yy) / np.vdot(want, want)
    assert abs(abs(g) - 1.0) < 0.03, g
    assert np.max(np.abs(yy - g * want)) < 0.05


def test_rational_approx():
    fr = rational_approx(200e3 / 2.56e6)
    assert (fr.numerator, fr.denominator) == (5, 64)
    fr = rational_approx(0.123456)
    assert abs(float(fr) - 0.123456) < 1e-6


def test_hilbert_roundtrip():
    """real → complex → real recovers a delayed copy of the input."""
    rng = np.random.default_rng(2)
    n = 8192
    x = sig.lfilter(sig.firwin(51, [0.1, 0.8], pass_zero=False), [1.0],
                    rng.normal(size=n)).astype(np.float32)
    s1 = real_to_complex_init()
    s1, c = real_to_complex_stream(s1, jnp.asarray(x))
    assert c.shape[0] == n // 2
    s2 = complex_to_real_init()
    s2, y = complex_to_real_stream(s2, c)
    y = np.asarray(y)
    snr = testsig.snr_db(x[200:-200], y[200:-200])
    # the reference-spec filter is short (semi-len 5 ⇒ 21 taps), so the
    # round-trip is transition-band limited; ~23 dB is expected
    assert snr > 20.0, snr


def test_hilbert_tone_is_analytic():
    """A real tone at f maps to a single complex tone (one-sided spectrum)."""
    n = 8192
    f = 0.1
    x = testsig.tone(n, f, complex_out=False)
    s, c = real_to_complex_stream(real_to_complex_init(), jnp.asarray(x))
    c = np.asarray(c)[200:]
    spec = np.abs(np.fft.fft(c * np.hanning(len(c))))
    peak = np.argmax(spec)
    image = (len(c) - peak) % len(c)
    assert spec[peak] / (spec[image] + 1e-9) > 100.0
