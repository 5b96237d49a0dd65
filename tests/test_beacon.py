"""Coded 4-FSK beacon (models/beacon.py): below-noise-floor decode."""

from __future__ import annotations

import numpy as np
import pytest

from csdr_tpu.models import beacon


def _payload(seed=0):
    return np.random.default_rng(seed).integers(0, 2, beacon.MESSAGE_BITS)


def test_sync_chips_fixed_and_balanced():
    c = beacon.sync_chips()
    assert len(c) == beacon.N_SYMBOLS
    assert c[:8].tolist() == beacon.sync_chips()[:8].tolist()  # deterministic
    assert 0.3 < c.mean() < 0.7                                # LFSR balance


def test_clean_roundtrip():
    p = _payload(1)
    x = beacon.beacon_modulate(p, spsym=64)
    got, info = beacon.beacon_decode(x, spsym=64)
    assert info["synced"] and info["offset"] == 0 and info["freq_bin"] == 0
    assert got is not None and np.array_equal(got, p)
    assert info["agreement"] == 1.0


def test_decode_below_noise_floor():
    """−13 dB SNR in the full baseband bandwidth: the per-sample signal is
    20x weaker than the noise, recovered by the spsym=64 matched-filter
    gain (~18 dB) + the rate-1/2 Viterbi."""
    rng = np.random.default_rng(2)
    p = _payload(3)
    x = beacon.beacon_modulate(p, spsym=64)
    snr_db = -13.0
    sigma_c = np.sqrt(10.0 ** (-snr_db / 10.0) / 2.0)
    noisy = x + sigma_c * (rng.normal(size=len(x))
                           + 1j * rng.normal(size=len(x)))
    got, info = beacon.beacon_decode(noisy, spsym=64)
    assert got is not None and np.array_equal(got, p), info


def test_time_and_frequency_offset():
    """A beacon arriving with unknown delay and a tone-spacing frequency
    error still syncs and decodes."""
    rng = np.random.default_rng(4)
    p = _payload(5)
    x = beacon.beacon_modulate(p, spsym=64)
    off = 23
    t = np.arange(len(x) + 200)
    shifted = np.concatenate([
        np.zeros(off, np.complex64), x,
        np.zeros(200 - off, np.complex64)])
    shifted = (shifted * np.exp(2j * np.pi * 1.0 * t / 64)).astype(
        np.complex64)                     # +1 tone spacing
    noisy = shifted + 0.3 * (rng.normal(size=len(shifted))
                             + 1j * rng.normal(size=len(shifted)))
    got, info = beacon.beacon_decode(noisy, spsym=64)
    assert got is not None and np.array_equal(got, p), info
    assert info["freq_bin"] == 1
    assert abs(info["offset"] - off) <= 3


def test_garbage_refuses():
    rng = np.random.default_rng(6)
    noise = (rng.normal(size=beacon.N_SYMBOLS * 64)
             + 1j * rng.normal(size=beacon.N_SYMBOLS * 64)).astype(
        np.complex64)
    got, info = beacon.beacon_decode(noise, spsym=64)
    assert got is None


def test_payload_length_validated():
    with pytest.raises(ValueError):
        beacon.beacon_modulate(np.zeros(10, np.int64))
