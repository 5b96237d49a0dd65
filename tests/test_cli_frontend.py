"""CLI front-end paths: offset mixing + resampling before demod (the
reference's prep = takeNArr ns . (resampler . offset) chain)."""

import os

import numpy as np

from csdr_tpu.apps.soapy_sdr_cli import main as cli_main
from csdr_tpu.io import wav as wavio
from csdr_tpu.utils import testsig


def test_cli_offset_and_bandwidth(tmp_path):
    """FM signal at +200 kHz offset in a 2.56 MHz capture; tune with --offset,
    decimate to 320 kHz with -b, demod NBFM."""
    os.chdir(tmp_path)
    fs = 2.56e6
    n = 1 << 19
    from scipy.signal import firwin, lfilter
    rng = np.random.default_rng(0)
    from scipy.signal import resample_poly
    msg = lfilter(firwin(101, 0.04), [1.0], rng.normal(size=n // 8))
    msg = (msg / (3 * np.max(np.abs(msg)))).astype(np.float32)
    bb = testsig.fm_mod(msg, 0.075)          # modulate at the 320 kHz rate
    up = resample_poly(bb, 8, 1)[:n]         # smooth upsample to 2.56 MHz
    t = np.arange(n)
    iq = (up * np.exp(2j * np.pi * np.mod(200e3 / fs * t, 1.0))).astype(np.complex64)
    iq.tofile("cap.cf32")

    ns = n // 8  # post-resample samples
    rc = cli_main([
        "--filename", "cap.cf32", "-s", str(fs), "--offset", "200e3",
        "-b", "320e3", "-n", str(ns),
        "--demod", "DeNBFM 0.075 WAV", "-o", "tuned",
        "--blocksize", str(1 << 16),
    ])
    assert rc == 0
    audio, sr = wavio.read_wav("tuned.wav")
    assert sr == 320000
    assert len(audio) == ns
    # Full-chain float64 oracle (offset mix → resample_poly → DC notch →
    # conj-product demod): measured ~85 dB, limited only by the msresamp
    # kaiser cascade vs the oracle's resample_poly band edge ⇒ 60 dB floor.
    mixed = iq.astype(np.complex128) * np.exp(-2j * np.pi * np.mod(200e3 / fs * t, 1.0))
    dn = resample_poly(mixed, 1, 8)
    r = 1.0 - 0.0005
    g = (1.0 + r) / 2.0
    dcb = lfilter([g, -g], [1.0, -r], dn)
    prev = np.concatenate([[1.0 + 0j], dcb[:-1]])
    oracle = np.angle(dcb * np.conj(prev)) / (2 * np.pi * 0.075)
    snr = testsig.snr_db(oracle[2000:-2000],
                         audio[2000:len(oracle) - 2000].astype(np.float64))
    assert snr > 60.0, snr
    # message-level recovery (the DC notch on the NBFM carrier bounds this
    # around ~25-30 dB by design — see test_baseline_configs config 2)
    snr_msg = testsig.snr_db(msg[2000:-2000], audio[2000:-2000])
    assert snr_msg > 15.0, snr_msg


def test_cli_numsamples_counts_post_resample(tmp_path):
    """-n counts samples after the front end (reference prep ordering,
    apps/SoapySDR.hs:206-207)."""
    os.chdir(tmp_path)
    fs = 2.56e6
    n = 1 << 18
    rng = np.random.default_rng(1)
    (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64).tofile("w.cf32")
    ns = 20000
    rc = cli_main([
        "--filename", "w.cf32", "-s", str(fs), "-b", "640e3", "-n", str(ns),
        "-o", "cap", "--blocksize", str(1 << 16),
    ])
    assert rc == 0
    assert os.path.getsize("cap.cf32") == ns * 8
