"""Symbol sync, symbol tracker, FM-with-sync, stereo FM decoder."""

import numpy as np
import pytest

import jax.numpy as jnp

import csdr_tpu as cs
from csdr_tpu.core.runtime import Pipeline
from csdr_tpu.models.symsync import sym_sync_r, sym_sync_c, sym_tracker, fm_dem_with_sync
from csdr_tpu.models.stereo import stereo_fm_decoder
from csdr_tpu.utils import testsig, firdes


def fractional_delay(x, d, ntaps=61):
    """Apply fractional delay d (samples) via windowed-sinc interpolation."""
    t = np.arange(ntaps) - (ntaps - 1) / 2
    h = np.sinc(t - (d - int(d))) * np.hamming(ntaps)
    y = np.convolve(x, h)[int(d) + (ntaps - 1) // 2:]
    return y[:len(x)]


def run_block(block, x, nblocks=2):
    st = block.init()
    outs = []
    n = (len(x) // nblocks // block.granule) * block.granule
    for i in range(nblocks):
        st, y = block.apply(st, jnp.asarray(x[i * n:(i + 1) * n]))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def test_sym_sync_r_recovers_pam_timing():
    rng = np.random.default_rng(0)
    k, nsym = 10, 2000
    bits = rng.integers(0, 2, nsym) * 2 - 1
    # NRZ pulse train with smooth transitions (like an FM-demodulated FSK)
    x = np.repeat(bits.astype(np.float64), k)
    x = np.convolve(x, np.hanning(7) / np.hanning(7).sum(), mode="same")
    x = fractional_delay(x, 3.7)
    y = run_block(sym_sync_r(k, 4, 0.0, 64), x.astype(np.float32))
    # even outputs are symbol centers (output rate 2/symbol)
    centers = y[0::2]
    # constant processing delay: find bit alignment by correlation
    best = 0, 0
    for lag in range(-16, 17):
        a = bits[max(0, lag):]
        b = np.sign(centers[max(0, -lag):])
        m = min(len(a), len(b)) - 10
        score = np.mean(a[:m] == b[:m])
        if score > best[0]:
            best = score, lag
    assert best[0] > 0.99, best


def test_sym_sync_c_bpsk():
    rng = np.random.default_rng(1)
    k, m, nsym = 4, 3, 4000
    bits = rng.integers(0, 2, nsym) * 2 - 1
    h = firdes.rrc(k, m, 0.5)
    up = np.zeros(nsym * k)
    up[::k] = bits
    x = np.convolve(up, h)[: nsym * k] * np.sqrt(k)
    x = fractional_delay(x, 1.3).astype(np.complex64)
    y = run_block(sym_sync_c(m, k), x)
    centers = np.real(y[0::2])
    best = 0, 0
    for lag in range(-16, 17):
        a = bits[max(0, lag):]
        b = np.sign(centers[max(0, -lag):])
        mm = min(len(a), len(b)) - 10
        score = np.mean(a[:mm] == b[:mm])
        if score > best[0]:
            best = score, lag
    assert best[0] > 0.98, best


def test_fm_dem_with_sync_roundtrip():
    """The DeNBFMSync path: 2-FSK → NBFM demod → symsync → ±levels at
    2 samples/symbol (reference fmDemWithSync, Liquid.chs:431-437)."""
    rng = np.random.default_rng(2)
    k, nsym = 10, 2000
    bits = rng.integers(0, 2, nsym)
    dev = 0.02 * k  # matches demod gain kf = 0.02·k
    freq = (bits * 2.0 - 1.0) * dev * 0.5
    inst = np.repeat(freq, k)
    phase = 2 * np.pi * np.cumsum(inst) * 0.02 * k / (0.02 * k)
    iq = np.exp(1j * 2 * np.pi * np.cumsum(np.repeat((bits * 2 - 1) * 0.02 * k * 0.5, k)))
    iq = iq.astype(np.complex64)
    blk = fm_dem_with_sync(k)
    y = run_block(blk, iq)
    centers = np.sign(y[0::2])
    want = bits * 2 - 1
    best = 0, 0
    for lag in range(-16, 17):
        a = want[max(0, lag):]
        b = centers[max(0, -lag):]
        mm = min(len(a), len(b)) - 10
        score = np.mean(a[:mm] == b[:mm])
        if score > best[0]:
            best = score, lag
    assert best[0] > 0.99, best


def test_sym_sync_r_tracks_clock_offset():
    """A 200 ppm symbol-clock offset drifts timing by many samples over the
    block; the windowed linear-fit estimator must track it (liquid's closed
    loop does; a single per-block estimate cannot)."""
    rng = np.random.default_rng(9)
    k, nsym = 10, 20000
    eps = 2e-4  # 200 ppm
    bits = rng.integers(0, 2, nsym) * 2 - 1
    # dense (8x) pulse train sampled at k·(1+eps) samples/symbol
    dense = np.repeat(bits.astype(np.float64), 8 * k)
    t_rx = np.arange(int(nsym * k / (1 + eps) - 16)) * (1 + eps)
    x = np.interp(t_rx * 8, np.arange(len(dense)), dense)
    x = np.convolve(x, np.hanning(7) / np.hanning(7).sum(), mode="same")
    blk = sym_sync_r(k, 4, 0.0, 64)
    y = run_block(blk, x.astype(np.float32), nblocks=4)
    centers = np.sign(y[0::2])
    best = 0
    for lag in range(-16, 17):
        a = bits[max(0, lag):]
        b = centers[max(0, -lag):]
        mm = min(len(a), len(b)) - 10
        best = max(best, np.mean(a[:mm] == b[:mm]))
    assert best > 0.99, best


def test_sym_sync_r_bounded_carry_under_persistent_offset():
    """Drift FAR beyond the history slack (τ would reach ~16 symbols).  The
    carried τ must stay bounded (graceful whole-symbol slips) instead of
    growing until the interpolation window leaves the data and output
    silently corrupts — each output segment must still demodulate at some
    local lag (a slip shifts the lag, it must not destroy the symbols)."""
    rng = np.random.default_rng(17)
    k, nsym = 10, 32000
    eps = 5e-4  # 500 ppm: total drift ≈ 160 samples = 16 symbols >> slack
    bits = rng.integers(0, 2, nsym) * 2 - 1
    dense = np.repeat(bits.astype(np.float64), 8 * k)
    t_rx = np.arange(int(nsym * k / (1 + eps) - 16)) * (1 + eps)
    x = np.interp(t_rx * 8, np.arange(len(dense)), dense)
    x = np.convolve(x, np.hanning(7) / np.hanning(7).sum(), mode="same")
    x = x.astype(np.float32)

    blk = sym_sync_r(k, 4, 0.0, 64)
    st = blk.init()
    nblocks = 16
    n = (len(x) // (nblocks * k)) * k
    taus, segs = [], []
    for i in range(nblocks):
        st, y = blk.apply(st, x[i * n:(i + 1) * n])
        taus.append(abs(float(st[1])))
        segs.append(np.sign(np.asarray(y)[0::2]))
    # carry stays within slack + one block's drift
    assert max(taus) < blk.B + eps * n + k, (max(taus), blk.B)
    # every segment still demodulates cleanly at its own local lag
    sym_per_blk = n // k
    for i, seg in enumerate(segs):
        ref = bits[i * sym_per_blk:(i + 1) * sym_per_blk]
        best = 0.0
        for lag in range(-24, 25):
            a = ref[max(0, lag):]
            b = seg[max(0, -lag):]
            mm = min(len(a), len(b)) - 4
            if mm > 100:
                best = max(best, float(np.mean(a[:mm] == b[:mm])))
        assert best > 0.97, (i, best)


def test_sym_tracker_bpsk():
    rng = np.random.default_rng(3)
    k, m, nsym = 4, 3, 8192
    bits = rng.integers(0, 2, nsym) * 2 - 1
    h = firdes.rrc(k, m, 0.25)
    up = np.zeros(nsym * k)
    up[::k] = bits
    x = np.convolve(up, h)[: nsym * k] * np.sqrt(k)
    # impairments: gain, small carrier offset phase, fractional timing, noise
    x = 0.25 * fractional_delay(x, 2.6) * np.exp(1j * 0.4)
    x = testsig.awgn(x.astype(np.complex64), 20.0, rng)
    y = run_block(sym_tracker(m, k), x)
    dec = np.sign(np.real(y))
    # BPSK sign ambiguity: accept either polarity; skip EQ convergence head
    tail_d, tail_b = dec[1000:], None
    best = 0
    for lag in range(-16, 17):
        for pol in (1, -1):
            a = bits[1000 + max(0, lag):]
            b = pol * dec[1000 + max(0, -lag):]
            mm = min(len(a), len(b)) - 10
            if mm < 100:
                continue
            best = max(best, np.mean(a[:mm] == b[:mm]))
    assert best > 0.95, best


def test_stereo_fm_decoder_scan_pll_separation():
    """The reference-faithful per-sample PLL mode (liquid fmsPll) must also
    separate channels once the 9 Hz loop has pulled in."""
    quad = 192000.0
    n = 1 << 17
    t = np.arange(n) / quad
    fL, fR = 800.0, 2500.0
    L = 0.8 * np.sin(2 * np.pi * fL * t)
    R = 0.8 * np.sin(2 * np.pi * fR * t)
    pilot = 0.1 * np.cos(2 * np.pi * 19000.0 * t + 0.7)
    sub = np.cos(2 * np.pi * 38000.0 * t + 1.4)
    mpx = 0.45 * (L + R) + pilot + 0.45 * (L - R) * sub
    dec = stereo_fm_decoder(quad, 4, pll_mode="scan")
    out = run_block(dec, mpx.astype(np.float32), nblocks=1)
    fs_out = quad / 4
    y = out[0][len(out[0]) // 2:]  # after pull-in
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y)))) ** 2
    freqs = np.fft.rfftfreq(len(y), 1 / fs_out)
    pw = lambda f0: spec[(freqs > f0 - 100) & (freqs < f0 + 100)].max()
    sep = 10 * np.log10(pw(fL) / pw(fR))
    assert sep > 15.0, sep


def test_stereo_fm_decoder_separation():
    quad = 192000.0
    decim = 4
    n = 1 << 17
    t = np.arange(n) / quad
    fL, fR = 800.0, 2500.0
    L = 0.8 * np.sin(2 * np.pi * fL * t)
    R = 0.8 * np.sin(2 * np.pi * fR * t)
    pilot = 0.1 * np.cos(2 * np.pi * 19000.0 * t + 0.7)
    sub = np.cos(2 * np.pi * 38000.0 * t + 1.4)  # phase-locked: 2×pilot phase
    mpx = 0.45 * (L + R) + pilot + 0.45 * (L - R) * sub

    dec = stereo_fm_decoder(quad, decim)
    out = run_block(dec, mpx.astype(np.float32), nblocks=2)
    assert out.shape[0] == 2
    fs_out = quad / decim
    for ch, (fwant, fother) in enumerate([(fL, fR), (fR, fL)]):
        y = out[ch][2000:]
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y)))) ** 2
        freqs = np.fft.rfftfreq(len(y), 1 / fs_out)
        def band_power(f0):
            sel = (freqs > f0 - 100) & (freqs < f0 + 100)
            return spec[sel].max()
        sep = 10 * np.log10(band_power(fwant) / band_power(fother))
        assert sep > 20.0, (ch, sep)


def test_sym_sync_scan_mode():
    """Closed-loop (Gardner/PI) symsync mode — liquid-faithful dynamics."""
    rng = np.random.default_rng(0)
    k, nsym = 10, 2000
    bits = rng.integers(0, 2, nsym) * 2 - 1
    x = np.repeat(bits.astype(np.float64), k)
    x = np.convolve(x, np.hanning(7) / np.hanning(7).sum(), mode="same")
    x = fractional_delay(x, 3.7)
    y = run_block(sym_sync_r(k, 4, 0.0, 64, mode="scan"), x.astype(np.float32))
    centers = np.sign(y[0::2])
    half = len(centers) // 2  # judge post-convergence
    best = 0
    for lag in range(-16, 17):
        a = bits[half + max(0, lag):]
        b = centers[half + max(0, -lag):]
        m = min(len(a), len(b)) - 10
        if m > 100:
            best = max(best, np.mean(a[:m] == b[:m]))
    assert best > 0.99, best


def test_sym_sync_scan_complex():
    rng = np.random.default_rng(1)
    k, m, nsym = 4, 3, 4000
    bits = rng.integers(0, 2, nsym) * 2 - 1
    h = firdes.rrc(k, m, 0.5)
    up = np.zeros(nsym * k)
    up[::k] = bits
    x = np.convolve(up, h)[: nsym * k] * np.sqrt(k)
    x = fractional_delay(x, 1.3).astype(np.complex64)
    y = run_block(sym_sync_c(m, k, mode="scan"), x)
    centers = np.real(y[0::2])
    half = len(centers) // 2
    best = 0
    for lag in range(-16, 17):
        a = bits[half + max(0, lag):]
        b = np.sign(centers[half + max(0, -lag):])
        mm = min(len(a), len(b)) - 10
        if mm > 100:
            best = max(best, np.mean(a[:mm] == b[:mm]))
    assert best > 0.97, best
