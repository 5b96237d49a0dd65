"""NCO mixers, FM/AM/FSK demodulators, AGC+squelch."""

import numpy as np

import jax.numpy as jnp

from csdr_tpu.ops.nco import mix_stream
from csdr_tpu.ops.demod import freqdem_stream, amdem, fskdem_block
from csdr_tpu.ops.agc import agc_init, agc_stream
from csdr_tpu.utils import testsig


def test_mix_down_shifts_tone_to_dc():
    n = 1 << 14
    f = 0.01  # cycles/sample
    omega = 2 * np.pi * f
    x = testsig.tone(n, f)
    phase = jnp.zeros((), jnp.float32)
    phase, y = mix_stream(phase, jnp.asarray(x), omega, up=False)
    y = np.asarray(y)
    # result should be ~DC (1+0j)
    assert np.max(np.abs(y - 1.0)) < 1e-2


def test_mix_streaming_phase_continuity():
    n = 4096
    omega = 2 * np.pi * 0.013
    x = np.ones(n, np.complex64)
    phase = jnp.zeros((), jnp.float32)
    parts = []
    for i in range(0, n, 1024):
        phase, y = mix_stream(phase, jnp.asarray(x[i:i + 1024]), omega, up=True)
        parts.append(np.asarray(y))
    got = np.concatenate(parts)
    t = np.arange(n)
    want = np.exp(1j * np.mod(omega * t, 2 * np.pi))
    assert np.max(np.abs(got - want)) < 2e-3


def test_fm_mod_demod_roundtrip():
    rng = np.random.default_rng(0)
    n = 1 << 15
    # band-limited message
    msg = rng.normal(size=n)
    from scipy.signal import lfilter, firwin
    msg = lfilter(firwin(101, 0.05), [1.0], msg).astype(np.float32)
    # keep peak deviation 2π·kf·|m| below π so the phase never wraps
    msg /= 2.5 * np.max(np.abs(msg))
    kf = 0.6
    x = testsig.fm_mod(msg, kf)
    # streaming demod over blocks; initial "previous sample" = 1+0j (zero phase)
    last = jnp.ones((1,), jnp.complex64)
    outs = []
    for i in range(0, n, 8192):
        last, y = freqdem_stream(last, jnp.asarray(x[i:i + 8192]), kf)
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    snr = testsig.snr_db(msg, got, skip=64)
    assert snr > 40.0, snr


def test_am_demod_roundtrip():
    rng = np.random.default_rng(1)
    n = 8192
    from scipy.signal import lfilter, firwin
    msg = lfilter(firwin(101, 0.05), [1.0], rng.normal(size=n)).astype(np.float32)
    msg /= 1.1 * np.max(np.abs(msg))
    x = testsig.am_mod(msg, 0.8)
    got = np.asarray(amdem(jnp.asarray(x), 0.8))
    snr = testsig.snr_db(msg, got, skip=64)
    assert snr > 60.0, snr


def test_fsk_roundtrip():
    rng = np.random.default_rng(2)
    m_bits, k, bw = 2, 32, 0.2
    nsym = 512
    syms = rng.integers(0, 1 << m_bits, size=nsym)
    x = testsig.fsk_mod(syms, m_bits, k, bw)
    got = np.asarray(fskdem_block(jnp.asarray(x), m_bits, k, bw))
    assert np.array_equal(got, syms)


def test_fsk_roundtrip_noisy():
    rng = np.random.default_rng(3)
    m_bits, k, bw = 1, 16, 0.25
    nsym = 1024
    syms = rng.integers(0, 2, size=nsym)
    x = testsig.awgn(testsig.fsk_mod(syms, m_bits, k, bw), 10.0, rng)
    got = np.asarray(fskdem_block(jnp.asarray(x), m_bits, k, bw))
    ber = np.mean(got != syms)
    assert ber < 0.01, ber


def test_agc_normalizes_amplitude():
    n = 1 << 14
    x = (0.01 * testsig.tone(n, 0.05)).astype(np.complex64)
    state = agc_init()
    state, y = agc_stream(state, jnp.asarray(x))
    y = np.asarray(y)
    # after convergence output amplitude ~= 1
    assert abs(np.mean(np.abs(y[n // 2:])) - 1.0) < 0.05


def test_agc_squelch_gates_noise():
    n = 1 << 14
    rng = np.random.default_rng(4)
    weak = 1e-5 * (rng.normal(size=n // 2) + 1j * rng.normal(size=n // 2))
    strong = 0.1 * np.asarray(testsig.tone(n // 2, 0.03))
    x = np.concatenate([weak, strong]).astype(np.complex64)
    state = agc_init()
    state, y = agc_stream(state, jnp.asarray(x), squelch_threshold_db=-60.0)
    y = np.asarray(y)
    # weak section (rssi ~ -100 dB < -60) must be squelched to zero
    assert np.max(np.abs(y[1000:n // 2])) == 0.0
    # strong section passes (after the gain loop reacts)
    assert np.mean(np.abs(y[-2000:])) > 0.5


def test_agc_streaming_consistency():
    n = 8192
    rng = np.random.default_rng(5)
    x = (0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
    s1 = agc_init()
    s1, whole = agc_stream(s1, jnp.asarray(x), squelch_threshold_db=-70.0)
    s2 = agc_init()
    parts = []
    for i in range(0, n, 2048):
        s2, y = agc_stream(s2, jnp.asarray(x[i:i + 2048]), squelch_threshold_db=-70.0)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), np.asarray(whole), rtol=1e-4, atol=1e-5)
