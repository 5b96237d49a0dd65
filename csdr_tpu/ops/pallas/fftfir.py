"""Pallas TPU kernel: overlap-save FFT convolution with the FFT factored into
MXU matmuls.

XLA's generic FFT is not a TPU strength; the MXU is.  A 16384-point DFT
factors (four-step / Cooley-Tukey, S = N1·N2 with N1 = N2 = 128) into

    A = x.reshape(N1, N2)                       # n = n1·N2 + n2
    B[k1, n2] = Σ_{n1} W1[k1, n1] · A[n1, n2]   # (128, 128) matmul
    C[k1, k2] = Σ_{n2} (B ∘ T)[k1, n2] · W2[n2, k2]   # twiddle + matmul

i.e. two MXU-perfect (128, 128) complex matmuls — and the inverse is the
same structure with conjugated constants.  Overlap-save convolution then is:
forward 2 matmuls → pointwise ∘ H (1/S folded in, stored in the permuted
[k1, k2] layout so no reordering is ever materialized) → inverse 2 matmuls.
Complex arithmetic runs as split re/im planes (4 real matmuls per complex
matmul ⇒ 16 per segment), so the whole kernel is matmuls + elementwise —
no in-kernel lane↔sublane reshapes (Mosaic restriction, docs/
TPU_BACKEND_NOTES.md); the (nseg, N1, N2) segment layout is prepared by XLA
outside.

Serves the long-FIR cases the banded-Toeplitz kernel (fir_kernel.py) does
not cover efficiently: complex taps (stereo pilot band-pass,
firFilterCKaiser — /root/reference/src/ComposableSDR/Liquid.chs:868-916) and
very long filters, replacing liquid's per-sample firfilt path (SURVEY.md §7:
one kernel serves complex FIR, real FIR, Hilbert, decimating FIR).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fft_fir_valid", "fft_consts"]

N1 = 128
N2 = 128
S = N1 * N2  # 16384-sample segments


@functools.lru_cache(maxsize=None)
def _stage_consts():
    """Forward DFT factor matrices and twiddles, float64-designed."""
    k1 = np.arange(N1)
    n2 = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(k1, k1) / N1)          # (k1, n1), symmetric
    W2 = np.exp(-2j * np.pi * np.outer(n2, n2) / N2)          # (n2, k2), symmetric
    T = np.exp(-2j * np.pi * np.outer(k1, n2) / S)            # (k1, n2)
    f32 = lambda a: np.ascontiguousarray(a).astype(np.float32)
    return (f32(W1.real), f32(W1.imag), f32(W2.real), f32(W2.imag),
            f32(T.real), f32(T.imag))


@functools.lru_cache(maxsize=None)
def _h_consts(taps_key):
    """Filter response in the permuted [k1, k2] four-step layout, 1/S scale
    folded in."""
    h = np.asarray(taps_key, dtype=np.complex128)
    Hf = np.fft.fft(h, S) / S
    H2 = Hf.reshape(N1, N2).T  # H2[k1, k2] = Hf[k2·N1 + k1]
    return (np.ascontiguousarray(H2.real).astype(np.float32),
            np.ascontiguousarray(H2.imag).astype(np.float32))


def fft_consts(taps: np.ndarray):
    W1r, W1i, W2r, W2i, Tr, Ti = _stage_consts()
    Hr, Hi = _h_consts(tuple(np.asarray(taps, dtype=np.complex128).tolist()))
    return W1r, W1i, W2r, W2i, Tr, Ti, Hr, Hi


def _kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, w2r_ref, w2i_ref,
            tr_ref, ti_ref, hr_ref, hi_ref, yr_ref, yi_ref, *, ts):
    W1r, W1i = w1r_ref[:], w1i_ref[:]
    W2r, W2i = w2r_ref[:], w2i_ref[:]
    Tr, Ti = tr_ref[:], ti_ref[:]
    Hr, Hi = hr_ref[:], hi_ref[:]

    def mm(a, b):
        # HIGHEST: the default TPU matmul truncates operands to bf16, which
        # costs ~40 dB of stop-band on the DFT factor matrices (measured
        # 4.3e-3 rel err vs scipy on chip; 1e-5 with full f32 passes)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    for t in range(ts):
        Ar, Ai = xr_ref[t], xi_ref[t]
        # forward stage 1: B = W1 @ A
        Br = mm(W1r, Ar) - mm(W1i, Ai)
        Bi = mm(W1r, Ai) + mm(W1i, Ar)
        # twiddle: C = B ∘ T
        Cr = Br * Tr - Bi * Ti
        Ci = Br * Ti + Bi * Tr
        # forward stage 2: D = C @ W2
        Dr = mm(Cr, W2r) - mm(Ci, W2i)
        Di = mm(Cr, W2i) + mm(Ci, W2r)
        # spectrum multiply (H carries 1/S): E = D ∘ H
        Er = Dr * Hr - Di * Hi
        Ei = Dr * Hi + Di * Hr
        # inverse stage 1: F = E @ conj(W2)
        Fr = mm(Er, W2r) + mm(Ei, W2i)
        Fi = mm(Ei, W2r) - mm(Er, W2i)
        # inverse twiddle: G = F ∘ conj(T)
        Gr = Fr * Tr + Fi * Ti
        Gi = Fi * Tr - Fr * Ti
        # inverse stage 2: Y = conj(W1) @ G
        yr_ref[t] = mm(W1r, Gr) + mm(W1i, Gi)
        yi_ref[t] = mm(W1r, Gi) - mm(W1i, Gr)


@functools.partial(jax.jit, static_argnames=("K", "n", "ts", "interpret"))
def _fft_fir(segs_re, segs_im, consts, K: int, n: int, ts: int,
             interpret: bool):
    nseg = segs_re.shape[0]
    grid = nseg // ts
    seg_spec = pl.BlockSpec((ts, N1, N2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((N1, N2), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, ts=ts),
        grid=(grid,),
        in_specs=[seg_spec, seg_spec] + [const_spec] * 8,
        out_specs=[seg_spec, seg_spec],
        out_shape=[jax.ShapeDtypeStruct((nseg, N1, N2), jnp.float32)] * 2,
        interpret=interpret,
    )(segs_re, segs_im, *consts)
    # overlap-save: drop the first K−1 (wrapped) samples of every segment
    yr = yr.reshape(nseg, S)[:, K - 1:].reshape(-1)[:n]
    yi = yi.reshape(nseg, S)[:, K - 1:].reshape(-1)[:n]
    return yr, yi


def fft_fir_valid(xfull: jnp.ndarray, taps: np.ndarray, ts: int = 4,
                  interpret: bool = False) -> jnp.ndarray:
    """Causal valid convolution matching ops/fir.conv_valid semantics:
    input length n + K − 1 → output length n.  Real or complex input, real
    or complex taps (the Toeplitz kernel handles real taps only)."""
    taps = np.asarray(taps)
    K = len(taps)
    if K >= S:
        raise ValueError(f"taps ({K}) must be shorter than the {S} segment")
    n = xfull.shape[0] - (K - 1)
    if n <= 0:
        raise ValueError(
            f"input ({xfull.shape[0]}) must be longer than taps-1 ({K - 1}) "
            f"— the valid convolution would be empty")
    hop = S - (K - 1)
    nseg = -(-n // hop)
    nseg_p = -(-nseg // ts) * ts
    total = (nseg_p - 1) * hop + S
    pad = total - xfull.shape[0]
    xp = jnp.concatenate([xfull, jnp.zeros((max(pad, 0),), xfull.dtype)]) \
        if pad > 0 else xfull
    idx = jnp.asarray(
        (np.arange(nseg_p)[:, None] * hop + np.arange(S)[None, :]).astype(np.int32))

    complex_in = jnp.iscomplexobj(xp)
    segs_re = jnp.real(xp)[idx].reshape(nseg_p, N1, N2) if complex_in \
        else xp[idx].reshape(nseg_p, N1, N2)
    segs_im = jnp.imag(xp)[idx].reshape(nseg_p, N1, N2) if complex_in \
        else jnp.zeros_like(segs_re)

    consts = tuple(jnp.asarray(c) for c in fft_consts(taps))
    yr, yi = _fft_fir(segs_re, segs_im, consts, K=K, n=n, ts=ts,
                      interpret=interpret)
    if complex_in or np.iscomplexobj(taps):
        return jax.lax.complex(yr, yi)
    return yr
