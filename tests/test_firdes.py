"""Filter design validation against scipy oracles and the stop-band specs the
reference hard-codes (SURVEY.md §2b)."""

import numpy as np
import scipy.signal as sig

from csdr_tpu.utils import firdes


def stopband_atten_db(h, f_stop_lo, nfft=8192):
    w, H = sig.freqz(h, worN=nfft, fs=1.0)
    pb = np.max(np.abs(H))
    sb = np.max(np.abs(H)[w >= f_stop_lo])
    return 20 * np.log10(pb / (sb + 1e-300))


def test_kaiser_lowpass_meets_attenuation():
    # 60 dB spec with a generous transition band
    n = firdes.kaiser_filter_len(0.05, 60.0)
    h = firdes.kaiser_lowpass(n, 0.125, 60.0)
    assert stopband_atten_db(h, 0.125 + 0.05) > 58.0


def test_kaiser_lowpass_passband_flat():
    n = firdes.kaiser_filter_len(0.05, 60.0)
    h = firdes.kaiser_lowpass(n, 0.125, 60.0)
    w, H = sig.freqz(h, worN=8192, fs=1.0)
    pb = np.abs(H)[w <= 0.09]
    assert np.max(np.abs(20 * np.log10(pb))) < 0.5  # <0.5 dB ripple


def test_firdecim_kaiser_spec():
    # reference: firdecim_rrrf_create_kaiser(m, 10, 60) — Liquid.chs:487
    for m in (2, 4, 8):
        h = firdes.firdecim_kaiser(m, 10, 60.0)
        assert len(h) == 2 * m * 10 + 1
        assert abs(h.sum() - 1.0) < 1e-12
        assert stopband_atten_db(h, 0.5 / m + 0.35 / m) > 55.0


def test_pfb_prototype_spec():
    # reference: firpfbch_crcf_create_kaiser(0, nch, 7, 80) — Liquid.chs:813
    nch = 8
    h = firdes.pfb_kaiser_prototype(nch, 7, 80.0)
    assert len(h) == 2 * nch * 7
    assert stopband_atten_db(h, 1.0 / nch) > 70.0


def test_halfband_zeros():
    h = firdes.halfband_kaiser(6, 60.0)
    c = (len(h) - 1) // 2
    for i in range(len(h)):
        if i != c and (i - c) % 2 == 0:
            assert h[i] == 0.0


def test_rrc_matches_scipy_style_identity():
    # RRC cascade (h * h) should be ~ISI-free: samples at symbol spacing ~0
    k, m, beta = 4, 6, 0.25
    h = firdes.rrc(k, m, beta)
    g = np.convolve(h, h)
    center = (len(g) - 1) // 2
    sym_samples = g[center % k::k]
    peak = np.max(np.abs(sym_samples))
    isi = np.sort(np.abs(sym_samples))[:-1]
    assert np.max(isi) / peak < 0.02


def test_root_nyquist_kaiser_isi():
    k, m, beta = 4, 6, 0.5
    h = firdes.root_nyquist_kaiser(k, m, beta)
    g = np.convolve(h, h)
    center = (len(g) - 1) // 2
    sym = g[center % k::k]
    peak = np.max(np.abs(sym))
    isi = np.sort(np.abs(sym))[:-1]
    assert np.max(isi) / peak < 0.08  # approximate root design; liquid's
    # ARKAISER is likewise an approximation


def test_gmsk_pair_isi():
    k, m, bt = 4, 4, 0.3
    tx = firdes.gmsk_tx(k, m, bt)
    rx = firdes.gmsk_rx(k, m, bt)
    g = np.convolve(tx, rx)
    center = (len(g) - 1) // 2
    sym = g[center % k::k]
    peak = np.max(np.abs(sym))
    isi = np.sort(np.abs(sym))[:-1]
    assert np.max(isi) / peak < 0.12  # GMSK has intrinsic ISI; loose bound


def test_group_delay_linear_phase():
    h = firdes.kaiser_lowpass(101, 0.1, 60.0)
    assert abs(firdes.group_delay(h, 0.01) - 50.0) < 1e-6


def test_fractional_delay_shifts_group_delay():
    """fractional_delay(h, mu) adds exactly mu samples of group delay
    (liquid's rnyquist designs accept the same timing offset)."""
    h = firdes.kaiser_lowpass(101, 0.2, 60.0)
    for mu in (0.25, -0.4):
        hd = firdes.fractional_delay(h, mu)
        got = firdes.group_delay(hd, 0.05) - firdes.group_delay(h, 0.05)
        assert abs(got - mu) < 1e-3, (mu, got)
    assert firdes.fractional_delay(h, 0.0) is h
    import pytest

    with pytest.raises(ValueError, match="mu"):
        firdes.fractional_delay(h, 1.5)


def test_fir_filter_rnyquist_honors_mu():
    import csdr_tpu as cs

    h0 = cs.fir_filter_rnyquist(4, 3, 0.3).taps
    h1 = cs.fir_filter_rnyquist(4, 3, 0.3, mu=0.5).taps
    assert abs(firdes.group_delay(h1, 0.01)
               - firdes.group_delay(h0, 0.01) - 0.5) < 1e-3
