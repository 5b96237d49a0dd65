"""Real ↔ complex conversion via half-band Hilbert structure.

Reference behavior: liquid firhilbf with semi-length 5, 60 dB
(/root/reference/src/ComposableSDR/Liquid.chs:503-546): `realToComplex`
converts a real stream to IQ at half the rate (2:1 decim); `complexToReal`
the inverse (1:2 interp).  The reference's WAV source follows realToComplex
with mixUp(π) to recenter (Source.chs:273-307).

Implementation: complex band-pass taps hc[k] = 2·h_hb[k]·e^{+jπk/2} select the
positive-frequency half [0, fs/2]; decimating by 2 maps it to a full-band
complex stream centered at π (matching the reference's downstream mix
convention).  The half-band zeros make half the taps free.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..utils.firdes import halfband_kaiser
from .fir import fir_decim_stream, fir_interp_stream

__all__ = ["hilbert_taps", "real_to_complex_init", "real_to_complex_stream",
           "complex_to_real_init", "complex_to_real_stream"]


@functools.lru_cache(maxsize=None)
def hilbert_taps(semilen: int = 5, as_db: float = 60.0) -> np.ndarray:
    h = halfband_kaiser(semilen, as_db) * 2.0  # unity half-band passband
    k = np.arange(len(h))
    hc = 2.0 * h * np.exp(1j * np.pi * k / 2.0)
    return hc.astype(np.complex64)


def real_to_complex_init(semilen: int = 5):
    K = len(hilbert_taps(semilen))
    return jnp.zeros((K - 1,), dtype=jnp.float32)


def real_to_complex_stream(state, x: jnp.ndarray, semilen: int = 5, as_db: float = 60.0):
    """Real (len n, even) → complex (len n/2), spectrum centered at π."""
    hc = hilbert_taps(semilen, as_db)
    return fir_decim_stream(hc, 2, state, x, strategy="poly")


def complex_to_real_init(semilen: int = 5):
    K = len(hilbert_taps(semilen))
    Lsub = -(-K // 2)
    return jnp.zeros((Lsub - 1,), dtype=jnp.complex64)


def complex_to_real_stream(state, x: jnp.ndarray, semilen: int = 5, as_db: float = 60.0):
    """Complex (len n) → real (len 2n): interpolate by 2 against the same
    positive-frequency band-pass (selecting the analytic image at +π/2) and
    take twice the real part."""
    hc = hilbert_taps(semilen, as_db)
    state, y = fir_interp_stream(hc, 2, state, x)
    return state, (2.0 * jnp.real(y)).astype(jnp.float32)
