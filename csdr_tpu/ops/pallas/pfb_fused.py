"""Fused Pallas TPU kernel: PFB polyphase FIR + DFT matmul + FM demod.

The XLA path (ops/pfb.py + ops/demod.py) runs these as separate fused
clusters, each re-reading HBM.  This kernel does branch FIR → complex DFT
(two real MXU matmuls per side) → phase-differentiation FM demod in ONE pass
over VMEM-resident tiles, so the channelize+demod pipeline reads the input
once and writes the audio once — the "speed-of-light per chip" target of
BASELINE.json.

Complex data is carried as split re/im float32 planes (Pallas TPU has no
complex dtype).  atan2 is not lowered by Mosaic, so the kernel carries its
own polynomial arctangent (|err| < 1e-5 rad ⇒ ≈ −100 dB demod error floor,
far below the stop-band of every filter in the chain).

Layout: frames on the sublane axis, channels on the lane axis — the DFT is
then a (tileF, nch) @ (nch, nch) MXU matmul per tile.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pfb import pfb_taps, pfb_dft_matrix, pfb_offset
from ..nco import phase_ramp, phase_increment
from .bf16x3 import split_bf16, cdot3

__all__ = ["pfb_fm_fused", "pfb_channelize_fused", "channelized_fm_pallas_init",
           "channelized_fm_pallas_step"]

_TWO_PI = 2.0 * np.pi


def _atan(z):
    """Polynomial atan on |z| <= 1 (minimax, |err| ~ 1e-5)."""
    z2 = z * z
    p = jnp.float32(0.0208351)
    p = p * z2 - jnp.float32(0.0851330)
    p = p * z2 + jnp.float32(0.1801410)
    p = p * z2 - jnp.float32(0.3302995)
    p = p * z2 + jnp.float32(0.9998660)
    return z * p


def _fast_recip(x):
    """1/x for strictly-positive f32 without a divide: exponent-flip
    bit-trick seed (rel err ~3e-2) plus three Newton steps (~1 ulp final).

    Valid domain: 0 < x <= ~1e38.  Above ~2.1e38 the seed integer
    (0x7EF127EA - bits(x)) goes negative, the seed bitcasts to a negative
    float, and Newton iterates to NaN/garbage — so the input is clamped to
    1e38 here (callers in this kernel feed O(1) magnitudes and already bound
    the LOW end via ``hic``; the clamp makes the helper total on +f32).

    Measured on-chip verdict (benchmarks/probe_kernel_opts.py, scan-paired
    protocol): NEUTRAL — Mosaic's lowered divide already costs about the
    same as this sequence, so the divide stays the default and this path is
    kept behind the kernels' ``opts=("fast_atan",)`` gate as the recorded
    experiment.  (ABLATION_r02.json's 26% atan2 share is the whole stage —
    range reduction, polynomial, and quadrant selects — not the divide.)
    """
    x = jnp.minimum(x, jnp.float32(1e38))
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    r = jax.lax.bitcast_convert_type(jnp.int32(0x7EF127EA) - xi, jnp.float32)
    two = jnp.float32(2.0)
    r = r * (two - x * r)
    r = r * (two - x * r)
    return r * (two - x * r)


def _atan2(y, x, fast_recip: bool = False, ablate: tuple = ()):
    """Full-range polynomial atan2.  ``ablate`` statically removes parts for
    per-stage cost attribution on real hardware (benchmarks/probe_ablation.py
    sub-ladder) — production calls always pass () and compile the full form:
    "div" replaces the quotient with the numerator, "poly" the polynomial
    with identity, "sel" drops the three quadrant fixups, "rr" drops the
    whole range reduction (abs/min/max/div)."""
    if "rr" in ablate:
        return y if "poly" in ablate else _atan(y)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    hic = jnp.maximum(hi, jnp.float32(1e-30))
    if "div" in ablate:
        z = lo
    else:
        z = lo * _fast_recip(hic) if fast_recip else lo / hic
    a = z if "poly" in ablate else _atan(z)
    if "sel" in ablate:
        return a
    a = jnp.where(ay > ax, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0, -a, a)


def _branch_fir_dft(vre, vim, taps, wre, wim, L, nout):
    """Branch FIR over ``nout`` frames then the DFT matmul (re/im planes).

    The DFT matmuls run as the bf16_3x operand split (u@W ≈ u_hi@W_hi +
    u_lo@W_hi + u_hi@W_lo): ~−96 dB error instead of plain-bf16's −52 dB
    floor, at roughly half the MXU passes of a full-f32 HIGHEST product
    (Mosaic exposes no Precision.HIGH; see flagship_fused._permuted_dft)."""
    ure = None
    uim = None
    for l in range(L):
        tl = taps[l][None, :]
        sre = vre[L - 1 - l: L - 1 - l + nout] * tl
        sim = vim[L - 1 - l: L - 1 - l + nout] * tl
        ure = sre if ure is None else ure + sre
        uim = sim if uim is None else uim + sim

    ure_p, uim_p = split_bf16(ure), split_bf16(uim)
    wre_hi, wre_lo = split_bf16(wre)
    wim_hi, wim_lo = split_bf16(wim)
    return cdot3(ure_p, uim_p, wre_hi, wre_lo, wim_hi, wim_lo)


def _kernel(vre_ref, vim_ref, taps_ref, wre_ref, wim_ref, out_ref, *, L, tileF, inv_kf):
    # wre/wim may be column shards (nch, ncho) for channel-sharded meshes
    vre = vre_ref[0]  # (tileF + L, nch)
    vim = vim_ref[0]
    taps = taps_ref[:]  # (L, nch)
    # one extra frame at the left feeds the demod's d[t−1]
    dre, dim = _branch_fir_dft(vre, vim, taps, wre_ref[:], wim_ref[:], L, tileF + 1)

    # FM demod: angle(d[t] · conj(d[t-1])) · 1/(2π·kf)
    cre = dre[1:] * dre[:-1] + dim[1:] * dim[:-1]
    cim = dim[1:] * dre[:-1] - dre[1:] * dim[:-1]
    out_ref[0] = _atan2(cim, cre) * jnp.float32(inv_kf)


def _kernel_nodemod(vre_ref, vim_ref, taps_ref, wre_ref, wim_ref,
                    dre_ref, dim_ref, *, L, tileF):
    vre = vre_ref[0]
    vim = vim_ref[0]
    taps = taps_ref[:]
    dre, dim = _branch_fir_dft(vre, vim, taps, wre_ref[:], wim_ref[:], L, tileF)
    dre_ref[0] = dre
    dim_ref[0] = dim


@functools.partial(jax.jit, static_argnames=("nch", "L", "tileF", "kf", "interpret"))
def pfb_fm_fused(vfull_re, vfull_im, taps, wre, wim, *, nch: int, L: int,
                 tileF: int = 512, kf: float = 0.6, interpret: bool = False):
    """vfull_{re,im}: (F + L, nch) frame panels (L history frames in front,
    already phase-pre-shifted and frame-reversed — see
    channelized_fm_pallas_step).  Returns audio (F, ncho) float32, where
    ncho = wre.shape[1] (a column shard of the DFT matrix on channel-sharded
    meshes, the full nch otherwise)."""
    F = vfull_re.shape[0] - L
    ncho = wre.shape[1]
    assert F % tileF == 0, (F, tileF)
    T = F // tileF

    # per-tile overlapping slabs (T, tileF + L, nch) — 3% duplication buys
    # clean non-overlapping BlockSpecs that Mosaic double-buffers for free
    starts = np.arange(T)[:, None] * tileF + np.arange(tileF + L)[None, :]
    idx = jnp.asarray(starts.astype(np.int32))
    slab_re = vfull_re[idx]
    slab_im = vfull_im[idx]

    kernel = functools.partial(_kernel, L=L, tileF=tileF, inv_kf=1.0 / (_TWO_PI * kf))
    grid = (T,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tileF + L, nch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tileF + L, nch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, nch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, ncho), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, ncho), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tileF, ncho), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, tileF, ncho), jnp.float32),
        interpret=interpret,
    )(slab_re, slab_im, taps, wre, wim)
    return out.reshape(F, ncho)


@functools.partial(jax.jit, static_argnames=("nch", "L", "tileF", "interpret"))
def pfb_channelize_fused(vfull_re, vfull_im, taps, wre, wim, *, nch: int, L: int,
                         tileF: int = 512, interpret: bool = False):
    """Channelizer-only fused kernel: same inputs as pfb_fm_fused but returns
    the complex channel matrix as (d_re, d_im) of shape (F, ncho) — for flows
    that need the channelized IQ itself (raw splits, per-channel AGC before
    demod).  Uses L−1 history frames (no demod-prev frame needed)."""
    F = vfull_re.shape[0] - (L - 1)
    ncho = wre.shape[1]
    assert F % tileF == 0, (F, tileF)
    T = F // tileF
    starts = np.arange(T)[:, None] * tileF + np.arange(tileF + L - 1)[None, :]
    idx = jnp.asarray(starts.astype(np.int32))
    slab_re = vfull_re[idx]
    slab_im = vfull_im[idx]
    kernel = functools.partial(_kernel_nodemod, L=L, tileF=tileF)
    dre, dim = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tileF + L - 1, nch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tileF + L - 1, nch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, nch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, ncho), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, ncho), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tileF, ncho), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tileF, ncho), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, tileF, ncho), jnp.float32),
            jax.ShapeDtypeStruct((T, tileF, ncho), jnp.float32),
        ),
        interpret=interpret,
    )(slab_re, slab_im, taps, wre, wim)
    return dre.reshape(F, ncho), dim.reshape(F, ncho)


def channelized_fm_pallas_init(nch: int, m: int = 7):
    """State: NCO phase + L frames of pre-shifted input history (the extra
    frame beyond the FIR span feeds the demod's d[t−1]).

    Self-jitted: eager jnp.zeros(complex64) outside jit is UNIMPLEMENTED on
    this TPU backend and poisons later transfers (CLAUDE.md rule 1) — safe
    here even when called outside Pipeline._init."""
    L = 2 * m

    @jax.jit
    def _z():
        return (
            jnp.zeros((), jnp.float32),
            jnp.zeros((nch - 1,), jnp.complex64),
            jnp.zeros((L, nch), jnp.complex64),  # history (incl. demod prev)
        )
    return _z()


def channelized_fm_pallas_step(state, x, *, nch: int, m: int = 7, as_db: float = 80.0,
                               kf: float = 0.6, tileF: int = 512,
                               interpret: bool = False):
    """Drop-in fused equivalent of PFBChannelizer >> PerChannel(FMDemod):
    (state, x (n,) complex64) → (state, audio (nch, n/nch) float32)."""
    phase, hist_x, hist_v = state
    n = x.shape[0]
    F = n // nch
    L = 2 * m

    # NCO pre-shift (XLA, fuses with the frame reshape below)
    omega = pfb_offset(nch)
    ramp = jnp.asarray(phase_ramp(float(omega), int(n)))
    xs = x * jnp.exp(-1j * (phase + ramp)).astype(jnp.complex64)
    new_phase = jnp.mod(phase + phase_increment(float(omega), int(n)), _TWO_PI)

    # frame panels v[i, p] = xs[i·nch − p] (reversed frames)
    xfull = jnp.concatenate([hist_x, xs])
    v = xfull[: F * nch].reshape(F, nch)[:, ::-1]
    vfull = jnp.concatenate([hist_v, v], axis=0)  # (F + L, nch)

    taps = jnp.asarray(pfb_taps(nch, m, as_db))
    W = pfb_dft_matrix(nch)
    wre = jnp.asarray(W.real.astype(np.float32))
    wim = jnp.asarray(W.imag.astype(np.float32))

    audio = pfb_fm_fused(jnp.real(vfull), jnp.imag(vfull), taps, wre, wim,
                         nch=nch, L=L, tileF=tileF, kf=kf, interpret=interpret)

    new_state = (new_phase, xfull[F * nch:], vfull[F:])
    return new_state, audio.T
