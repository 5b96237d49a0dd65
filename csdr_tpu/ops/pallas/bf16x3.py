"""Shared bf16_3x split-operand matmul helpers for the fused Pallas kernels.

The fused kernels' DFT matmuls run as the 3-multiply operand split

    u @ W  ≈  u_hi @ W_hi  +  u_lo @ W_hi  +  u_hi @ W_lo

with ``x_hi = bf16(x)`` and ``x_lo = bf16(x − f32(x_hi))``: ~−96 dB error
instead of plain-bf16's −52 dB floor, at roughly half the MXU passes of a
full-f32 (Precision.HIGHEST) product.  One implementation shared by
pfb_fused.py, flagship_fused.py and flagship_fused_wide.py so precision
changes cannot silently diverge between kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["split_bf16", "split_bf16_np", "dot3", "cdot3",
           "cdot3_kara"]


def split_bf16(a):
    """f32 array → (hi, lo) bf16 planes with hi + lo ≈ a."""
    hi = a.astype(jnp.bfloat16)
    return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def split_bf16_np(a):
    """Host-side (numpy/ml_dtypes) twin of split_bf16, for precomputed
    constant planes (DFT matrices) shipped into the kernels — same rounding
    contract so W-plane and u-plane splits can never diverge."""
    import ml_dtypes
    import numpy as np

    full = np.ascontiguousarray(a).astype(np.float32)
    hi = full.astype(ml_dtypes.bfloat16)
    return hi, (full - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)


def dot3(u_pair, w_hi, w_lo):
    """3-multiply bf16 product of split u against split W, f32 accumulate."""
    u_hi, u_lo = u_pair
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jnp.dot(u_hi, w_hi, **kw) + jnp.dot(u_lo, w_hi, **kw)
            + jnp.dot(u_hi, w_lo, **kw))


def cdot3(ure_p, uim_p, wre_hi, wre_lo, wim_hi, wim_lo):
    """Complex (ure + j·uim) @ (Wre + j·Wim), each plane via dot3."""
    dre = dot3(ure_p, wre_hi, wre_lo) - dot3(uim_p, wim_hi, wim_lo)
    dim = dot3(ure_p, wim_hi, wim_lo) + dot3(uim_p, wre_hi, wre_lo)
    return dre, dim


def cdot3_kara(ure_p, uim_p, usum_p, wre, wmr, wpr):
    """3-multiply (Karatsuba) complex product: 9 bf16 MXU passes instead of
    cdot3's 12.  With host-precomputed combination planes
    Wmr = Wim − Wre and Wpr = Wre + Wim (each a (hi, lo) split pair):

        k1 = (Re+Im) @ Wre,  k2 = Re @ Wmr,  k3 = Im @ Wpr
        dre = k1 − k3,       dim = k1 + k2

    ``usum_p`` is split_bf16(ure + uim).  Error floor ~2-3× the cdot3 one
    (operand magnitudes double in the combos) — still ≈ −88 dB, beyond the
    80 dB channelizer spec."""
    k1 = dot3(usum_p, wre[0], wre[1])
    k2 = dot3(ure_p, wmr[0], wmr[1])
    k3 = dot3(uim_p, wpr[0], wpr[1])
    return k1 - k3, k1 + k2
