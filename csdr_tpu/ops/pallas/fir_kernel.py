"""Pallas TPU kernel: long FIR convolution as Toeplitz row-block matmuls.

For filters too long for the VPU slice strategy, the causal convolution
y[n] = Σ_k h[k]·x[n−k] over 128-lane rows becomes a small sum of MXU matmuls:

    y_row[r] = Σ_{d=0}^{D} x_row[r−d] @ T_d,
    T_d[j, i] = h[i − j + 128·d]   (banded Toeplitz, (128, 128) each)

with D = ceil(K/128) — i.e. a K-tap FIR costs (D+1) matmuls per row
regardless of K, at MXU throughput.  Complex data runs as split re/im planes
(4 real matmul-sums).  The kernel tiles rows with an overlap of D rows so
each grid step is independent (same slab trick as pfb_fused).

Used by ops/fir.conv_valid(strategy="pallas_mxu") and benchmarked against
the slices/FFT strategies.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["toeplitz_banks", "pallas_fir_valid"]

LANES = 128


@functools.lru_cache(maxsize=None)
def _banks_cached(key):
    h, = key  # tuple of taps
    h = np.asarray(h, dtype=np.float64)
    K = len(h)
    D = -(-K // LANES)
    banks = np.zeros((D + 1, LANES, LANES), dtype=np.float32)
    j = np.arange(LANES)[:, None]
    i = np.arange(LANES)[None, :]
    for d in range(D + 1):
        k = i - j + LANES * d
        valid = (k >= 0) & (k < K)
        banks[d] = np.where(valid, h[np.clip(k, 0, K - 1)], 0.0)
    return banks


def toeplitz_banks(h: np.ndarray) -> np.ndarray:
    """(D+1, 128, 128) banded-Toeplitz matrices for taps ``h`` (real)."""
    return _banks_cached((tuple(np.asarray(h, dtype=np.float64).tolist()),))


def _kernel(x_ref, banks_ref, out_ref, *, D, rows):
    x = x_ref[0]          # (rows + D, LANES)
    banks = banks_ref[:]  # (D+1, LANES, LANES)
    acc = None
    for d in range(D + 1):
        # y_row[r] += x_row[r - d] @ T_d ; slab row (D + r) is output row r
        seg = x[D - d: D - d + rows]
        # HIGHEST: default TPU matmul truncates to bf16 — that cost this
        # kernel 2.3e-3 relative error (≈ −52 dB, marginal for 60–80 dB
        # filter specs); full f32 passes bring it to ~1e-7
        term = jnp.dot(seg, banks[d], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        acc = term if acc is None else acc + term
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def _fir_rows(xp, banks, tile_rows: int = 256, interpret: bool = False):
    """xp: (R + D, LANES) float32 padded rows (D history rows in front).
    Returns (R, LANES) outputs."""
    D = banks.shape[0] - 1
    R = xp.shape[0] - D
    T = -(-R // tile_rows)
    Rp = T * tile_rows
    if Rp != R:
        xp = jnp.concatenate(
            [xp, jnp.zeros((Rp - R, LANES), xp.dtype)], axis=0)
    starts = np.arange(T)[:, None] * tile_rows + np.arange(tile_rows + D)[None, :]
    slabs = xp[jnp.asarray(starts.astype(np.int32))]  # (T, tile_rows+D, LANES)
    out = pl.pallas_call(
        functools.partial(_kernel, D=D, rows=tile_rows),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile_rows + D, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D + 1, LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tile_rows, LANES), jnp.float32),
        interpret=interpret,
    )(slabs, banks)
    return out.reshape(T * tile_rows, LANES)[:R]


def pallas_fir_valid(xfull: jnp.ndarray, taps: np.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Causal valid convolution matching ops/fir.conv_valid semantics:
    input length n + K − 1 → output length n (y[i] uses xfull[i .. i+K−1]).
    Real taps; real or complex input."""
    taps = np.asarray(taps, dtype=np.float64)
    K = len(taps)
    n = xfull.shape[0] - (K - 1)
    D = -(-K // LANES)
    banks = jnp.asarray(toeplitz_banks(taps))

    def run_plane(plane):
        # stream index: y[i] = Σ_k h[k]·s[i + K−1 − k] where s = xfull.
        # Arrange rows so row r of the output starts at stream position
        # K−1 + 128·r; prepend D rows of history covering [K−1−128·D, K−1).
        lead = 128 * D - (K - 1)  # ≥ 0 padding before xfull
        total_rows = D + (-(-n // LANES))
        need = total_rows * LANES - (lead + xfull.shape[0])
        padded = jnp.concatenate([
            jnp.zeros((lead,), plane.dtype), plane,
            jnp.zeros((max(need, 0),), plane.dtype)])
        rows = padded[: total_rows * LANES].reshape(total_rows, LANES)
        y = _fir_rows(rows, banks, interpret=interpret)
        return y.reshape(-1)[:n]

    if jnp.iscomplexobj(xfull):
        yr = run_plane(jnp.real(xfull))
        yi = run_plane(jnp.imag(xfull))
        return jax.lax.complex(yr, yi)
    return run_plane(xfull)
