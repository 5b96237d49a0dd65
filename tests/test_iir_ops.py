"""IIR cascade + DC blocker vs scipy.signal.sosfilt / lfilter oracles."""

import numpy as np
import pytest
import scipy.signal as sig

import jax.numpy as jnp

from csdr_tpu.utils.iirdes import butter_sos, sos_to_onepole, dc_blocker_coeffs
from csdr_tpu.ops.iir import (
    onepole_cascade_init,
    onepole_cascade_stream,
    dc_blocker_init,
    dc_blocker_stream,
)


@pytest.mark.parametrize("order,fc", [(2, 0.02), (3, 0.1), (5, 0.25), (2, 0.002)])
def test_butter_real(order, fc):
    rng = np.random.default_rng(0)
    x = rng.normal(size=8192).astype(np.float32)
    sos = butter_sos(order, fc)
    casc = sos_to_onepole(sos, real_io=True)
    state = onepole_cascade_init(casc, complex_input=False)
    outs = []
    for i in range(0, 8192, 2048):
        state, y = onepole_cascade_stream(casc, state, jnp.asarray(x[i:i + 2048]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    want = sig.sosfilt(sos, x.astype(np.float64))
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(got - want)) / scale < 5e-3


@pytest.mark.parametrize("order,fc", [(2, 0.05), (4, 0.2)])
def test_butter_complex(order, fc):
    rng = np.random.default_rng(1)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
    sos = butter_sos(order, fc)
    casc = sos_to_onepole(sos, real_io=False)
    state = onepole_cascade_init(casc, complex_input=True)
    state, got = onepole_cascade_stream(casc, state, jnp.asarray(x))
    want = sig.sosfilt(sos, x.astype(np.complex128))
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(np.asarray(got) - want)) / scale < 5e-3


def test_dc_blocker_removes_dc_keeps_signal():
    n = 1 << 16
    t = np.arange(n)
    x = (0.5 + np.exp(1j * 2 * np.pi * 0.05 * t)).astype(np.complex64)
    state = dc_blocker_init(complex_input=True)
    state, y = dc_blocker_stream(state, jnp.asarray(x))
    y = np.asarray(y)
    tail = y[n // 2:]
    assert abs(np.mean(tail)) < 1e-2  # DC removed
    assert abs(np.std(tail) - np.std(np.exp(1j * 2 * np.pi * 0.05 * t))) < 5e-2


def test_dc_blocker_matches_lfilter():
    rng = np.random.default_rng(2)
    x = rng.normal(size=4096).astype(np.float32)
    b, a = dc_blocker_coeffs(0.0005)
    state = dc_blocker_init(complex_input=False)
    outs = []
    for i in range(0, 4096, 1024):
        state, y = dc_blocker_stream(state, jnp.asarray(x[i:i + 1024]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    want = sig.lfilter(b, a, x.astype(np.float64))
    assert np.max(np.abs(got - want)) < 2e-3 * np.max(np.abs(want))
