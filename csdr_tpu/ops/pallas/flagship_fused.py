"""Fully-fused flagship kernel: DC blocker → NCO pre-shift → PFB → DFT →
FM demod in ONE Pallas pass.

ops/pallas/pfb_fused.py fuses PFB+DFT+demod but leaves the DC blocker and
mixer to XLA (≈3 extra HBM round-trips of the 16 MB input block).  This
kernel keeps the tile resident in VMEM for the whole chain:

  * the DC-blocker recurrence y[n] = r·y[n-1] + g·(x[n]−x[n-1]) is solved
    with a THREE-LEVEL blocked decay-matmul pyramid inside the kernel
    (lanes → rows → super-rows), carries crossing grid tiles through VMEM/SMEM
    scratch (the TPU grid executes sequentially, so scratch is a legal
    carry);
  * the NCO pre-shift consumes a static phase-ramp panel plus the carried
    scalar phase (cos/sin on the VPU);
  * the PFB frame reversal is ALGEBRAIC: v[i,p] = x̂[i·nch−p] is re-expressed
    over natural frame panels ŝ[f,q] = x̂[f·nch+q] via host-precomputed
    permuted taps T̂[J,q] and DFT rows Ŵ[q,k] = W[(nch−q)%nch, k] — no
    in-kernel lane reversal;
  * demod is the in-kernel polynomial atan2 from pfb_fused.

Streaming state (carried between blocks at the Block level): scalar phase,
raw-input last sample, DC output last sample, and L+1 processed history
frames.
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
from .bf16x3 import split_bf16, split_bf16_np, cdot3, dot3
from .pfb_fused import _atan2

__all__ = ["flagship_fused_init", "flagship_fused_step"]

_TWO_PI = 2.0 * np.pi


@functools.lru_cache(maxsize=None)
def _permuted_tap_panel(nch: int, m: int, as_db: float) -> np.ndarray:
    """(L+1, nch) panel T̂ with û[i,q] = Σ_J T̂[J,q]·ŝ[i−J, q] equal to the
    PFB branch output u[i, p=(nch−q)%nch]."""
    taps = pfb_taps(nch, m, as_db)  # (L, nch); taps[l, p]
    L = taps.shape[0]
    That = np.zeros((L + 1, nch), dtype=np.float32)
    # q = 0 ↔ p = 0: v[i−l, 0] = ŝ[i−l, 0] → J = l  (J = 0..L−1)
    That[:L, 0] = taps[:, 0]
    # q ≥ 1 ↔ p = nch−q: v[i−l, p] = ŝ[i−l−1, q] → J = l+1 (J = 1..L)
    for q in range(1, nch):
        That[1:L + 1, q] = taps[:, nch - q]
    return That


@functools.lru_cache(maxsize=None)
def _permuted_dft(nch: int):
    """Permuted DFT factors, each split into bf16 hi+lo planes: W ≈ W_hi +
    W_lo with W_hi = bf16(W).  The in-kernel product then uses the 3-multiply
    scheme  u@W ≈ u_hi@W_hi + u_lo@W_hi + u_hi@W_lo  (the bf16_3x algorithm
    XLA calls Precision.HIGH, which Mosaic does not expose) — ~1.6e-5 rel
    err (−96 dB, comfortably beyond the 80 dB channelizer spec) at half the
    MXU passes of full-f32 HIGHEST."""
    W = pfb_dft_matrix(nch)  # W[p, k]
    q = np.arange(nch)
    Whet = W[(nch - q) % nch, :]  # Ŵ[q, k]
    return [split_bf16_np(comp) for comp in (Whet.real, Whet.imag)]
    # [(wre_hi, wre_lo), (wim_hi, wim_lo)]


@functools.lru_cache(maxsize=None)
def _decay(a: float, n: int) -> np.ndarray:
    i = np.arange(n)
    e = i[:, None] - i[None, :]
    return np.where(e >= 0, np.power(a, np.maximum(e, 0)), 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dc_diff_panels(a: float, g: float, n: int):
    """bf16 hi/lo planes of MdT = Md.T, where Md folds the one-sample
    difference INTO the lane decay matmul:  with T the lower-triangular
    decay matrix and Z the one-sample delay,  T·(I−Z) = I − α·T·Z,  so

        w[r, l] = g·x[r, l] + (x @ MdT)[r, l] − g·a^l·x_prev0[r]
        Md[l, l'] = −g·α·a^(l−1−l')   for l' < l, else 0.

    The identity part runs exactly on the VPU (one multiply); the residual
    matrix has entries of magnitude ≤ g·α ≈ 5e-4, so a 3-multiply bf16
    product (dot3) carries it at ~1e-6 absolute error — replacing the
    kernel's only full-f32 matmul with bf16 MXU passes AND deleting the
    roll/select/subtract passes that used to materialize x − x_prev."""
    i = np.arange(n)
    e = i[:, None] - 1 - i[None, :]
    Md = np.where(e >= 0, -g * (1.0 - a) * np.power(a, np.maximum(e, 0)), 0.0)
    return split_bf16_np(np.ascontiguousarray(Md.T).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _dc_pg_row(a: float, g: float, n: int) -> np.ndarray:
    """(1, n) row g·a^l — the x_prev0 coefficient per lane (see
    _dc_diff_panels)."""
    return (g * np.power(a, np.arange(n))[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _row_carry_matrix(a_row: float, tileF: int) -> np.ndarray:
    """(tileF+1, tileF) matrix S with S[f, f'] = a_row^(f−1−f') for f' ≤ f−1:
    g_entering_row_f = (S @ row_end_carries)[f] + a_row^f · g_in.  Row tileF
    gives the tile's outgoing carry.  A plain strictly-lower-triangular decay
    matvec — Mosaic-friendly (the 3-level reshape pyramid used by ops/linrec
    is an unsupported vector-layout shape cast in-kernel)."""
    f = np.arange(tileF + 1)[:, None]
    fp = np.arange(tileF)[None, :]
    e = f - 1 - fp
    return np.where(e >= 0, np.power(a_row, np.maximum(e, 0)), 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _powvec(a: float, n: int) -> np.ndarray:
    return np.power(a, np.arange(1, n + 1)).astype(np.float32)[None, :]


@functools.lru_cache(maxsize=None)
def _row_decay_col(a_row: float, tileF: int) -> np.ndarray:
    """(tileF+1, 1) column a_row^f — the g_in coefficient per row."""
    return np.power(a_row, np.arange(tileF + 1))[:, None].astype(np.float32)


def _dc_solve(f_comp, T1, S, p1, pN, g_in, nch, tileF):
    """Solve y = a·y₋₁ + f over the flattened (tileF, nch) panel for one real
    component; g_in is the entering carry (scalar).  Two matmuls, no
    reshapes: lane-level decay matmul + row-carry lower-triangular matvec."""
    w = jnp.dot(f_comp, T1.T, preferred_element_type=jnp.float32)   # (tileF, nch)
    c = w[:, nch - 1:nch]                                           # (tileF, 1)
    gext = jnp.dot(S, c, preferred_element_type=jnp.float32)        # (tileF+1, 1)
    gext = gext + pN * g_in
    g_prev = gext[:tileF]                                           # entering each row
    y = w + p1 * g_prev
    return y, gext[tileF, 0]


def _dc_solve_stacked(X, MdT_hi, MdT_lo, S, p1, pg, pN,
                      x0_re, x0_im, gin_re, gin_im, g_gain, rows):
    """DC blocker over BOTH real components stacked along the sublane axis:
    X = [x_re; x_im], shape (2*rows, n).  Identical algebra (bit-identical
    results) to _dc_solve_pair, but every pass — the bf16 operand split, the
    three Md matmuls, the boundary fixups, the carry correction — runs ONCE
    over the doubled panel instead of once per component.

    Measured on-chip verdict (benchmarks/probe_kernel_opts.py, scan-paired
    protocol): ~9% SLOWER than the per-component path — the stacked panel
    must materialize a (2·rows, n) copy of the whole input before any DC
    work can start, which defeats Mosaic's software pipelining of the
    per-component passes.  Kept behind the kernels' ``opts=("dc_stack",)``
    gate as the recorded negative result; _dc_solve_pair is production.

    The previous-sample column comes from ONE sublane roll of X's last lane;
    the roll wraps garbage into row 0 (from x_im's tail) and row ``rows``
    (from x_re's tail) — exactly the two rows the carried seeds overwrite.
    The carry correction runs per half (Mosaic cannot sublane-concat two
    slices living at different lane offsets) — everything upstream of it is
    shared.  Returns (y_re, y_im, g_out_re, g_out_im)."""
    colp = pltpu.roll(X[:, -1:], 1, axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, 1), 0)
    colp = jnp.where(ridx == 0, x0_re, colp)
    colp = jnp.where(ridx == rows, x0_im, colp)
    g = jnp.float32(g_gain)
    w = g * X + dot3(split_bf16(X), MdT_hi, MdT_lo) - pg * colp
    c2 = jnp.concatenate([w[:rows, -1:], w[rows:, -1:]], axis=1)   # (rows, 2)
    gext2 = jnp.dot(S, c2, preferred_element_type=jnp.float32)     # (rows+1, 2)
    gin2 = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1) == 0,
                     gin_re, gin_im)
    gext2 = gext2 + pN * gin2
    y_re = w[:rows] + p1 * gext2[:rows, 0:1]
    y_im = w[rows:] + p1 * gext2[:rows, 1:2]
    return y_re, y_im, gext2[rows, 0], gext2[rows, 1]


def _hier_group(rows: int) -> int | None:
    """Group size B for the hierarchical row-carry solve: full-sublane
    groups (B=128) with 2..64 of them (the packed per-group carry pairs
    must fit one 128-lane row: 2G <= 128).  None means the panel is out of
    the measured-win regime — use the dense solve: at rows=128 (B=64) the
    pack/unpack overhead measured 4% SLOWER than the small dense matvec
    (ABLATION_SUB_r03 dc_hier_gain at tileF=256), while B=128 groups
    measured +17% at tileH=512 (KERNEL_OPTS_r03)."""
    if rows % 128 == 0 and 2 <= rows // 128 <= 64:
        return 128
    return None


def _dc_solve_pair_hier(xre, xim, MdT_hi, MdT_lo, S_B, p1, pg,
                        xp0_re, xp0_im, gin_re, gin_im, g_gain, rows,
                        B, a_row):
    """Row-carry solve in TWO levels instead of one dense matvec.

    The production ``_dc_solve_pair`` solves the row recurrence
    g[f] = a_row.g[f-1] + c[f-1] with a dense (rows+1, rows) f32
    lower-triangular matmul — O(rows^2) MXU work whose N=2 result column
    pads to the full 128 lanes, so at tileF=1024 the matvec alone costs more
    MXU passes than the DFT (ABLATION_r02: the DC stage is 45.7% of the
    kernel).  This variant packs the per-group carry columns along LANES:

      C[:, 2k:2k+2] = c2[k.B:(k+1).B]                (G lane-slices)
      Hg = S_B @ C                                   ((B+1, B) @ (B, 2G))
      E[k] = aB.E[k-1] + Hg[B, k-1],  E[0] = g_in    (log2 G doubling scan
                                                      on a padded 128-lane
                                                      row; aB = a_row^B)
      ge[k.B+i] = Hg[i, k-pair] + a_row^i . E[k]     (one fma)

    — O(rows.B) MXU work, exact same algebra (different summation order:
    results match the dense solve to f32 rounding, ~1e-6).  ``S_B`` is
    _row_carry_matrix(a_row, B); everything else is built in-kernel from
    iota + exp on tiny panels."""
    g = jnp.float32(g_gain)
    w_re = g * xre + dot3(split_bf16(xre), MdT_hi, MdT_lo) - pg * xp0_re
    w_im = g * xim + dot3(split_bf16(xim), MdT_hi, MdT_lo) - pg * xp0_im
    G = rows // B
    aB = float(a_row) ** B
    # lane-pack the per-group carry columns into a FULL 128-lane panel
    # (pairs at lanes [0, 2G), zeros beyond): Mosaic keeps every row op on
    # the standard (., 128) vreg shape, and the zero tail rides through the
    # matmul/scan unchanged
    parts = [jnp.concatenate([w_re[k * B:(k + 1) * B, -1:],
                              w_im[k * B:(k + 1) * B, -1:]], axis=1)
             for k in range(G)]
    if 2 * G < 128:
        parts.append(jnp.zeros((B, 128 - 2 * G), jnp.float32))
    C = jnp.concatenate(parts, axis=1)                        # (B, 128)
    Hg = jnp.dot(S_B, C, preferred_element_type=jnp.float32)  # (B+1, 128)
    T_row = Hg[B:B + 1]                                       # (1, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    P = T_row
    s = 1
    while s < G:
        rolled = pltpu.roll(P, 2 * s, axis=1)
        P = P + jnp.float32(aB ** s) * jnp.where(lane >= 2 * s, rolled, 0.0)
        s *= 2
    # E[k] = aB^k.g_in + P[k-1]  (shift right one pair, zero-fill)
    Pr = pltpu.roll(P, 2, axis=1)
    E_noin = jnp.where(lane >= 2, Pr, 0.0)
    k_lane = lane // 2
    powA2 = jnp.exp(k_lane.astype(jnp.float32) * jnp.float32(np.log(aB)))
    gin_row = jnp.where(lane % 2 == 0, gin_re, gin_im)
    E = E_noin + powA2 * gin_row                              # (1, 128)
    # per-row within-group decay column a_row^i
    rio = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    pB = jnp.exp(rio.astype(jnp.float32) * jnp.float32(np.log(a_row)))
    Ge = Hg[:B] + pB * E                                      # (B, 128)
    # unpack (B, 128) group pairs -> (rows, 2): canonicalize every group's
    # pair to lane offset 0 with a roll BEFORE the sublane concat — Mosaic
    # cannot concatenate vregs whose lane offsets differ (observed
    # "tpu.concatenate" lowering failure on offset slices)
    ge_parts = [(Ge if k == 0
                 else pltpu.roll(Ge, 128 - 2 * k, axis=1))[:, 0:2]
                for k in range(G)]
    ge = jnp.concatenate(ge_parts, axis=0)                    # (rows, 2)
    y_re = w_re + p1 * ge[:, 0:1]
    y_im = w_im + p1 * ge[:, 1:2]
    # outgoing carry: g_out = sum_{j<=G-1} aB^(G-1-j).T[j] + aB^G.g_in
    g_out_re = P[0, 2 * G - 2] + jnp.float32(aB ** G) * gin_re
    g_out_im = P[0, 2 * G - 1] + jnp.float32(aB ** G) * gin_im
    return y_re, y_im, g_out_re, g_out_im


def _dc_solve_pair(xre, xim, MdT_hi, MdT_lo, S, p1, pg, pN,
                   xp0_re, xp0_im, gin_re, gin_im, g_gain, rows,
                   ablate: tuple = ()):
    """DC blocker over both real components of a flattened (rows, n) panel
    via the difference-folded decay form (_dc_diff_panels):

        w = g·x + dot3(split(x), MdT) − pg·x_prev0
        row carries: one batched S @ [c_re c_im] matvec, then per-component
        p1·g_prev correction (identical algebra to _dc_solve).

    xp0_* are (rows, 1) columns of the previous row's last sample (row 0
    seeded from the carried scalar); gin_* the entering tile carries.
    ``ablate`` statically removes sub-stages for on-chip cost attribution
    (probe_ablation sub-ladder; production always passes ()): "md" drops the
    difference-fold matmul, "rowcarry" drops the row-carry matvec+fixup."""
    g = jnp.float32(g_gain)
    if "md" in ablate:
        w_re = g * xre - pg * xp0_re
        w_im = g * xim - pg * xp0_im
    else:
        w_re = g * xre + dot3(split_bf16(xre), MdT_hi, MdT_lo) - pg * xp0_re
        w_im = g * xim + dot3(split_bf16(xim), MdT_hi, MdT_lo) - pg * xp0_im
    if "rowcarry" in ablate:
        return w_re, w_im, gin_re, gin_im
    c2 = jnp.concatenate([w_re[:, -1:], w_im[:, -1:]], axis=1)   # (rows, 2)
    gext2 = jnp.dot(S, c2, preferred_element_type=jnp.float32)   # (rows+1, 2)
    ge_re = gext2[:, 0:1] + pN * gin_re
    ge_im = gext2[:, 1:2] + pN * gin_im
    y_re = w_re + p1 * ge_re[:rows]
    y_im = w_im + p1 * ge_im[:rows]
    return y_re, y_im, ge_re[rows, 0], ge_im[rows, 0]


def _kernel(xre_ref, xim_ref, ramp2_ref, mdT_hi_ref, mdT_lo_ref, S_ref,
            p64_ref, pg_ref, pN_ref, That_ref,
            wre_hi_ref, wre_lo_ref, wim_hi_ref, wim_lo_ref,
            phase_ref, hist_in_re_ref, hist_in_im_ref, scal_in_ref,
            audio_ref, hist_out_re_ref, hist_out_im_ref, scal_out_ref,
            hist_re_scr, hist_im_scr, scal_scr,
            *, nch, L, tileF, g_gain, a_row, hierB, inv_kf,
            u8_input=False, opts=()):
    # ``opts`` statically selects experimental implementations for on-chip
    # A/B measurement (benchmarks/probe_kernel_opts.py): "dc_stack" = stacked
    # DC solve (measured 9% slower — kept as the recorded negative result),
    # "fast_atan" = Newton-reciprocal atan2 (measured neutral), "dc_hier" =
    # two-level row-carry solve (round 3; S_ref then carries the (B+1, B)
    # group matrix instead of the dense (tileF+1, tileF) one).  Default ()
    # = the production paths.
    i = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        hist_re_scr[:] = hist_in_re_ref[:]
        hist_im_scr[:] = hist_in_im_ref[:]
        for idx in range(4):  # SMEM allows scalar access only
            scal_scr[idx] = scal_in_ref[idx]

    if "dc_stack" not in opts:
        if u8_input:
            # rtl_sdr cu8 planes arrive as raw uint8: the HBM read is 2 bytes
            # per IQ sample instead of 8 — conversion to float happens here in
            # VMEM ((v − 127.5)/127.5, the standard rtl_sdr mapping).  Mosaic
            # has no direct uint8→f32 lowering; route through int32.
            k_scale = jnp.float32(1.0 / 127.5)
            xre = xre_ref[0].astype(jnp.int32).astype(jnp.float32) * k_scale - 1.0
            xim = xim_ref[0].astype(jnp.int32).astype(jnp.float32) * k_scale - 1.0
        else:
            xre = xre_ref[0]  # (tileF, nch)
            xim = xim_ref[0]

        # ---- DC blocker (difference-folded decay matmul, _dc_diff_panels);
        # only the previous row's LAST sample is still needed explicitly (the
        # x − x_prev difference lives inside MdT); row 0 seeds from the carry
        col_prev_re = pltpu.roll(xre[:, nch - 1:nch], 1, axis=0)
        col_prev_im = pltpu.roll(xim[:, nch - 1:nch], 1, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (tileF, 1), 0)
        col_prev_re = jnp.where(row == 0, scal_scr[0], col_prev_re)
        col_prev_im = jnp.where(row == 0, scal_scr[1], col_prev_im)

        if hierB:
            ydc_re, ydc_im, glast_re, glast_im = _dc_solve_pair_hier(
                xre, xim, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:], p64_ref[:],
                pg_ref[:], col_prev_re, col_prev_im,
                scal_scr[2], scal_scr[3], g_gain, tileF, hierB, a_row)
        else:
            ydc_re, ydc_im, glast_re, glast_im = _dc_solve_pair(
                xre, xim, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:], p64_ref[:],
                pg_ref[:], pN_ref[:], col_prev_re, col_prev_im,
                scal_scr[2], scal_scr[3], g_gain, tileF)
        x_last_re = xre[tileF - 1, nch - 1]
        x_last_im = xim[tileF - 1, nch - 1]
    else:
        # experimental: x_re stacked over x_im along sublanes so the u8
        # conversion and every DC pass run once on a (2·tileF, nch) panel —
        # measured SLOWER on chip; see _dc_solve_stacked's verdict
        if u8_input:
            Xi = jnp.concatenate([xre_ref[0].astype(jnp.int32),
                                  xim_ref[0].astype(jnp.int32)], axis=0)
            X = Xi.astype(jnp.float32) * jnp.float32(1.0 / 127.5) - 1.0
        else:
            X = jnp.concatenate([xre_ref[0], xim_ref[0]], axis=0)

        ydc_re, ydc_im, glast_re, glast_im = _dc_solve_stacked(
            X, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:], p64_ref[:],
            pg_ref[:], pN_ref[:], scal_scr[0], scal_scr[1],
            scal_scr[2], scal_scr[3], g_gain, tileF)
        x_last_re = X[tileF - 1, nch - 1]
        x_last_im = X[2 * tileF - 1, nch - 1]

    # ---- NCO pre-shift: multiply by e^{-jθ} ----
    # ω = −π(nch−1)/nch ⇒ the phase ramp is periodic with period 2·nch
    # samples EXACTLY (ω·2nch ≡ 0 mod 2π), i.e. it alternates between two
    # nch-sample rows — a (2, nch) constant instead of an (F, nch) panel
    # (saves a full 4-byte-per-sample HBM read).
    # cos/sin run on the (2, nch) table only — theta takes 2·nch distinct
    # values, so materializing it per-sample would spend two transcendental
    # VPU passes per sample where two cheap parity selects suffice.
    ramp2 = ramp2_ref[:]  # (2, nch)
    theta2 = ramp2 + phase_ref[0, 0]
    c2 = jnp.cos(theta2)
    s2 = jnp.sin(theta2)
    row_par = jax.lax.broadcasted_iota(jnp.int32, (tileF, 1), 0) % 2
    cth = jnp.where(row_par == 0, c2[0][None, :], c2[1][None, :])
    sth = jnp.where(row_par == 0, s2[0][None, :], s2[1][None, :])
    sre = ydc_re * cth + ydc_im * sth
    sim = ydc_im * cth - ydc_re * sth

    # ---- PFB branch FIR over natural frame panels (permuted taps) ----
    ext_re = jnp.concatenate([hist_re_scr[:], sre], axis=0)  # (tileF + L + 1, nch)
    ext_im = jnp.concatenate([hist_im_scr[:], sim], axis=0)
    That = That_ref[:]

    def fir_dft_demod(pre, pim, outrows):
        """FIR → DFT → FM demod over ``L + 1 + outrows`` ext rows →
        (outrows, nch) audio.  Factored so the splitN default can run
        independent sub-tile chains (see below)."""
        ure = None
        uim = None
        for J in range(L + 1):
            tj = That[J][None, :]
            # û_t = Σ_J T̂[J]·ŝ_ext[t + L − J],  t ∈ [0, outrows+1)
            seg_re = pre[L - J: L - J + outrows + 1] * tj
            seg_im = pim[L - J: L - J + outrows + 1] * tj
            ure = seg_re if ure is None else ure + seg_re
            uim = seg_im if uim is None else uim + seg_im

        # DFT matmuls via the bf16_3x split (see _permuted_dft): full-f32
        # HIGHEST costs 2.15× end-to-end on this kernel; default bf16 has a
        # −52 dB error floor; 3x lands at −96 dB for ~half of HIGHEST's
        # passes
        ure_p = split_bf16(ure)
        uim_p = split_bf16(uim)
        dre, dim = cdot3(ure_p, uim_p, wre_hi_ref[:], wre_lo_ref[:],
                         wim_hi_ref[:], wim_lo_ref[:])

        # ---- FM demod ----
        cre = dre[1:] * dre[:-1] + dim[1:] * dim[:-1]
        cim = dim[1:] * dre[:-1] - dre[1:] * dim[:-1]
        return (_atan2(cim, cre, fast_recip="fast_atan" in opts)
                * jnp.float32(inv_kf))

    parts = 1 if "split1" in opts else (4 if "split4" in opts else 2)
    if parts > 1 and tileF % parts == 0 and tileF // parts >= L + 1:
        # splitN (round 4, mirrors flagship_fused_wide): independent
        # sub-tile FIR→DFT→demod chains give Mosaic's scheduler MXU/VPU
        # overlap across chains; same ops, bit-identical audio (tests).
        # The wide-kernel A/B measured +8.4% median with the NCO fold
        # (KERNEL_SPLIT2FOLD_r04); the narrow layout keeps its explicit
        # NCO (its phase alternates per ROW — not foldable into a
        # constant), so only the split applies here.
        partH = tileF // parts
        for h in range(parts):
            lo = h * partH
            audio_ref[0, lo:lo + partH] = fir_dft_demod(
                ext_re[lo: lo + L + 1 + partH],
                ext_im[lo: lo + L + 1 + partH], partH)
    else:
        audio_ref[0] = fir_dft_demod(ext_re, ext_im, tileF)

    # ---- carry updates ----
    hist_re_scr[:] = ext_re[tileF:]
    hist_im_scr[:] = ext_im[tileF:]
    scal_scr[0] = x_last_re
    scal_scr[1] = x_last_im
    scal_scr[2] = glast_re
    scal_scr[3] = glast_im

    @pl.when(i == T - 1)
    def _():
        hist_out_re_ref[:] = hist_re_scr[:]
        hist_out_im_ref[:] = hist_im_scr[:]
        for idx in range(4):
            scal_out_ref[idx] = scal_scr[idx]


def flagship_fused_init(nch: int, m: int = 7):
    L = 2 * m
    return dict(
        phase=jnp.zeros((), jnp.float32),
        hist_re=jnp.zeros((L + 1, nch), jnp.float32),
        hist_im=jnp.zeros((L + 1, nch), jnp.float32),
        scal=jnp.zeros((4,), jnp.float32),  # x_last re/im, dc y_last re/im
    )


@functools.partial(jax.jit, static_argnames=("nch", "m", "as_db", "kf", "tileF",
                                             "dc_alpha", "interpret", "opts"))
def flagship_fused_step(state, x, *, nch: int, m: int = 7, as_db: float = 80.0,
                        kf: float = 0.6, tileF: int = 256,
                        dc_alpha: float = 0.0005, interpret: bool = False,
                        opts: tuple = ()):
    """(state, x) → (state, audio (nch, n/nch) float32).

    ``x`` is (n,) complex64 — or (2n,) uint8 interleaved rtl_sdr cu8, in
    which case the u8→float conversion happens inside the kernel and the
    input crosses the HBM (and host→device) wire at 2 bytes/sample instead
    of 8.  Drop-in fused equivalent of dcBlocker >> PFBChannelizer >>
    PerChannel(FMDemod) — the whole flagship compute in one kernel pass.
    """
    if isinstance(x, (tuple, list)):
        # pre-split u8 planes (re, im) — the host/native reader de-interleaves
        # at memcpy speed, the wire and the kernel's HBM read are 1 B/plane/
        # sample, and no XLA gather is needed at all (u8 strided ops on TPU
        # are emulated and slow — measured 2.6× slower than this path)
        u8_input = True
        xre_1d, xim_1d = x
        n = xre_1d.shape[0]
    else:
        u8_input = x.dtype == jnp.uint8
        n = x.shape[0] // 2 if u8_input else x.shape[0]
    F = n // nch
    L = 2 * m
    assert F % tileF == 0, (F, tileF)
    T = F // tileF
    r = 1.0 - dc_alpha
    g = (1.0 + r) / 2.0

    assert tileF % 2 == 0  # keeps the 2-row ramp's parity aligned per tile
    if isinstance(x, (tuple, list)):
        xre = xre_1d.reshape(T, tileF, nch)
        xim = xim_1d.reshape(T, tileF, nch)
    elif u8_input:
        # interleaved rtl_sdr cu8: de-interleave to u8 planes in XLA (a
        # 2-byte/sample strided copy), convert to float INSIDE the kernel
        pairs = x.reshape(n, 2)
        xre = pairs[:, 0].reshape(T, tileF, nch)
        xim = pairs[:, 1].reshape(T, tileF, nch)
    else:
        xre = jnp.real(x).reshape(T, tileF, nch)
        xim = jnp.imag(x).reshape(T, tileF, nch)
    omega = pfb_offset(nch)
    ramp2 = jnp.asarray(phase_ramp(float(omega), 2 * nch).reshape(2, nch))

    That = jnp.asarray(_permuted_tap_panel(nch, m, as_db))
    (wre_hi_np, wre_lo_np), (wim_hi_np, wim_lo_np) = _permuted_dft(nch)
    wre_hi = jnp.asarray(wre_hi_np, dtype=jnp.bfloat16)
    wre_lo = jnp.asarray(wre_lo_np, dtype=jnp.bfloat16)
    wim_hi = jnp.asarray(wim_hi_np, dtype=jnp.bfloat16)
    wim_lo = jnp.asarray(wim_lo_np, dtype=jnp.bfloat16)
    mdT_hi_np, mdT_lo_np = _dc_diff_panels(r, g, nch)
    mdT_hi = jnp.asarray(mdT_hi_np, dtype=jnp.bfloat16)
    mdT_lo = jnp.asarray(mdT_lo_np, dtype=jnp.bfloat16)
    pg = jnp.asarray(_dc_pg_row(r, g, nch))                # (1, nch): g·a^i
    a_row = float(r ** nch)
    # PRODUCTION DEFAULT since round 3: the two-level row-carry solve
    # measured +17% end-to-end (KERNEL_OPTS_r03.json, scan-paired, healthy
    # window) — the dense solve stays reachable via opts=("dc_dense",) for
    # reproduction/A-B.  Small tiles (no valid group size) use dense
    # automatically.
    use_hier = "dc_dense" not in opts and "dc_stack" not in opts
    hierB = _hier_group(tileF) if use_hier else None
    # dc_hier swaps the dense row-carry matrix for the (B+1, B) group one
    S = jnp.asarray(_row_carry_matrix(a_row, hierB if hierB else tileF))
    p64 = jnp.asarray(_powvec(r, nch))                     # (1, nch): a^(i+1)
    # the hier solve never reads the dense decay column — ship a (1, 1)
    # placeholder instead of the (tileF+1, 1) VMEM constant on that path
    pN = (jnp.zeros((1, 1), jnp.float32) if hierB
          else jnp.asarray(_row_decay_col(a_row, tileF)))  # (tileF+1, 1)
    phase = state["phase"].reshape(1, 1)

    kernel = functools.partial(
        _kernel, nch=nch, L=L, tileF=tileF, g_gain=g, a_row=a_row,
        hierB=hierB, inv_kf=1.0 / (_TWO_PI * kf), u8_input=u8_input,
        opts=tuple(opts))

    const2 = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                        memory_space=pltpu.VMEM)
    audio, hist_re, hist_im, scal = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tileF, nch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tileF, nch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const2((2, nch)),
            const2((nch, nch)), const2((nch, nch)),
            const2(tuple(S.shape)),
            const2((1, nch)), const2((1, nch)), const2(tuple(pN.shape)),
            const2((L + 1, nch)),
            const2((nch, nch)), const2((nch, nch)),
            const2((nch, nch)), const2((nch, nch)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            const2((L + 1, nch)), const2((L + 1, nch)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tileF, nch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const2((L + 1, nch)), const2((L + 1, nch)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, tileF, nch), jnp.float32),
            jax.ShapeDtypeStruct((L + 1, nch), jnp.float32),
            jax.ShapeDtypeStruct((L + 1, nch), jnp.float32),
            jax.ShapeDtypeStruct((4,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L + 1, nch), jnp.float32),
            pltpu.VMEM((L + 1, nch), jnp.float32),
            pltpu.SMEM((4,), jnp.float32),
        ],
        interpret=interpret,
    )(xre, xim, ramp2, mdT_hi, mdT_lo, S, p64, pg, pN, That,
      wre_hi, wre_lo, wim_hi, wim_lo, phase,
      state["hist_re"], state["hist_im"], state["scal"])

    new_phase = jnp.mod(state["phase"] + phase_increment(float(omega), int(n)),
                        np.float32(_TWO_PI))
    new_state = dict(phase=new_phase, hist_re=hist_re, hist_im=hist_im, scal=scal)
    if "audio_frames" in opts:
        return new_state, audio.reshape(F, nch)   # see flagship_fused_wide
    return new_state, audio.reshape(F, nch).T
