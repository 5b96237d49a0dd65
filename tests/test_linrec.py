"""Parallel linear-recurrence solver vs sequential float64 oracle."""

import numpy as np
import pytest

import jax

from csdr_tpu.ops.linrec import linrec, linrec_ref


@pytest.mark.parametrize("a", [0.9995, 0.5, -0.3, 0.999999])
def test_real_recurrence(a):
    rng = np.random.default_rng(1)
    b = rng.normal(size=10_000).astype(np.float32)
    y0 = 0.7
    y = np.asarray(jax.jit(lambda bb: linrec(bb, a, np.float32(y0)))(b))
    yr = linrec_ref(b.astype(np.float64), a, y0)
    err = np.max(np.abs(y - yr)) / (np.max(np.abs(yr)) + 1e-30)
    assert err < 2e-4


@pytest.mark.parametrize("a", [0.97 + 0.2j, 0.8 - 0.55j])
def test_complex_recurrence(a):
    rng = np.random.default_rng(2)
    b = (rng.normal(size=5_000) + 1j * rng.normal(size=5_000)).astype(np.complex64)
    y0 = np.complex64(0.1 - 0.2j)
    y = np.asarray(jax.jit(lambda bb: linrec(bb, a, y0))(b))
    yr = linrec_ref(b.astype(np.complex128), a, complex(y0))
    err = np.max(np.abs(y - yr)) / (np.max(np.abs(yr)) + 1e-30)
    assert err < 5e-4


def test_non_multiple_block_length():
    b = np.ones(777, dtype=np.float32)
    y = np.asarray(linrec(b, 0.9, np.float32(0.0)))
    yr = linrec_ref(b.astype(np.float64), 0.9, 0.0)
    assert np.allclose(y, yr, rtol=1e-4, atol=1e-4)


def test_streaming_consistency():
    """Splitting a sequence into blocks with carried y0 must equal one shot."""
    rng = np.random.default_rng(3)
    b = rng.normal(size=4096).astype(np.float32)
    a = 0.99
    whole = np.asarray(linrec(b, a, np.float32(0.0)))
    y0 = np.float32(0.0)
    parts = []
    for i in range(0, 4096, 1024):
        y = linrec(b[i:i + 1024], a, y0)
        y0 = y[-1]
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), whole, rtol=1e-5, atol=1e-5)
