"""SSB (USB/LSB) and CW demodulators — capability extensions beyond the
reference's Demod surface (apps/SoapySDR.hs:19-29 stops at FM/AM/FSK).

Oracle: scipy.signal.hilbert builds the analytic signal; a physically-mixed
SSB baseband is x = A/2 (Re[A·e^{jωct}] mixed down and low-passed), so the
demodulator's default gain=2 recovers unit audio amplitude.
"""

import numpy as np
import pytest
import scipy.signal as sig

import csdr_tpu as cs

FS = 48_000.0
TONES = (400.0, 1000.0, 2300.0)  # all inside a 3 kHz SSB channel


def make_audio(n: int) -> np.ndarray:
    t = np.arange(n) / FS
    a = sum(np.sin(2 * np.pi * f * t + 0.7 * i) for i, f in enumerate(TONES))
    return (a / len(TONES)).astype(np.float64)


def ssb_baseband(audio: np.ndarray, side: str) -> np.ndarray:
    analytic = sig.hilbert(audio)  # audio + j·ĥ(audio): occupies (0, +B]
    x = analytic if side == "usb" else np.conj(analytic)
    return (0.5 * x).astype(np.complex64)


def run_block(graph, x: np.ndarray, block_size: int = 8192) -> np.ndarray:
    snk = cs.CollectSink()
    cs.Pipeline(graph, block_size=block_size).run(iter([x]), snk)
    return np.asarray(snk.concat())


def snr_db(want: np.ndarray, got: np.ndarray) -> float:
    e = got - want
    return 10.0 * np.log10(np.sum(want ** 2) / max(np.sum(e ** 2), 1e-30))


@pytest.mark.parametrize("side", ["usb", "lsb"])
def test_ssb_recovers_audio(side):
    n = 1 << 16
    audio = make_audio(n)
    x = ssb_baseband(audio, side)
    dem = cs.ssb_demodulator(side, bandwidth=3000.0 / FS)
    y = run_block(dem, x)
    assert y.dtype == np.float32 and len(y) == n
    gd = dem.blocks[0].tail_len // 2  # linear phase: group delay (n_taps-1)/2
    lo, hi = 4096, n - gd - 4096  # skip filter transients
    assert snr_db(audio[lo:hi], y[lo + gd:hi + gd].astype(np.float64)) > 35.0


def test_ssb_rejects_opposite_sideband():
    n = 1 << 16
    audio = make_audio(n)
    lsb_signal = ssb_baseband(audio, "lsb")
    y = run_block(cs.ssb_demodulator("usb", bandwidth=3000.0 / FS), lsb_signal)
    y_pass = run_block(cs.ssb_demodulator("lsb", bandwidth=3000.0 / FS), lsb_signal)
    seg = slice(8192, n - 8192)
    rejection = 10 * np.log10(np.sum(y_pass[seg].astype(np.float64) ** 2)
                              / max(np.sum(y[seg].astype(np.float64) ** 2), 1e-30))
    assert rejection > 40.0, rejection


def test_ssb_demodulator_validates_args():
    with pytest.raises(ValueError, match="side"):
        cs.ssb_demodulator("dsb")
    with pytest.raises(ValueError, match="bandwidth"):
        cs.ssb_demodulator("usb", bandwidth=0.7)
    with pytest.raises(ValueError, match="bandwidth"):
        cs.cw_demodulator(bandwidth=0.0)


def test_cw_keyed_carrier_becomes_pitched_tone():
    """On-off-keyed carrier at DC → side-tone at the BFO pitch during key-on,
    silence during key-off."""
    n = 1 << 16
    t = np.arange(n)
    key = (t // 16384) % 2 == 0  # dit dah dit ...
    rng = np.random.default_rng(3)
    x = (key * 1.0 + 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n))
         ).astype(np.complex64)
    pitch = 700.0 / FS
    y = run_block(cs.cw_demodulator(bandwidth=500.0 / FS, pitch=pitch), x)
    on = y[4096:12288].astype(np.float64)     # inside the first key-on
    off = y[20480:28672].astype(np.float64)   # inside the first key-off
    S = np.abs(np.fft.rfft(on * np.hanning(len(on))))
    f_peak = np.argmax(S[1:]) + 1
    assert abs(f_peak / len(on) - pitch) < 2e-4
    assert np.sum(on ** 2) > 100.0 * np.sum(off ** 2)


def test_cli_ssb_to_wav(tmp_path):
    """CLI 'DeUSB 3000 WAV': exact sample accounting, audio tones recovered."""
    import os

    from csdr_tpu.apps.soapy_sdr_cli import main as cli_main
    from csdr_tpu.io import wav as wavio

    os.chdir(tmp_path)
    n = 1 << 16
    audio = make_audio(n)
    ssb_baseband(audio, "usb").tofile("ssb.cf32")
    rc = cli_main(["--filename", "ssb.cf32", "-s", str(FS), "-n", str(n),
                   "--demod", "DeUSB 3000 WAV", "-o", "voice",
                   "--blocksize", "16384"])
    assert rc == 0
    y, sr = wavio.read_wav("voice.wav")
    assert sr == int(FS) and len(y) == n
    gd = cs.ssb_demodulator("usb", 3000.0 / FS).blocks[0].tail_len // 2
    lo, hi = 4096, n - gd - 4096
    assert snr_db(audio[lo:hi], y[lo + gd:hi + gd].astype(np.float64)) > 35.0


def test_cli_ssb_sharded_matches_serial(tmp_path):
    """DeUSB under --mesh equals the single-device run (the SSB graph is a
    TailStateBlock FIR + stateless Re, sharded by the generic runtime)."""
    import os

    from csdr_tpu.apps.soapy_sdr_cli import main as cli_main
    from csdr_tpu.io import wav as wavio

    os.chdir(tmp_path)
    n = 1 << 16
    audio = make_audio(n)
    ssb_baseband(audio, "usb").tofile("ssb.cf32")
    args = ["--filename", "ssb.cf32", "-s", str(FS), "-n", str(n),
            "--demod", "DeUSB 3000 WAV", "--blocksize", "32768"]
    assert cli_main(args + ["-o", "serial"]) == 0
    assert cli_main(args + ["-o", "meshed", "--mesh", "4x1"]) == 0
    a, _ = wavio.read_wav("serial.wav")
    b, _ = wavio.read_wav("meshed.wav")
    assert a.shape == b.shape
    assert np.max(np.abs(a - b)) < 1e-6
