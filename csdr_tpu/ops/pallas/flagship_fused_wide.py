"""Wide-layout (128-lane) variant of the fully-fused flagship kernel.

`flagship_fused.py` shapes its panels `(tileF, nch)`.  For the flagship's
nch=64 that leaves the minor (lane) dimension at HALF the TPU's native 128
lanes: every HBM tile of the input planes and audio output is padded 64→128,
so the kernel physically moves ~2x the bytes it uses, and every matmul
contracts over only 64 of the MXU's 128 columns.

This kernel packs R = 128//nch consecutive FRAMES per panel row:

    s2[r, a*nch + q] = s[R*r + a, q]       a in [0, R)

so panels are (tileH, 128) with tileH = tileF/R — full lane utilization,
zero layout padding, and the reshape from the 1-D sample stream is
layout-preserving (sample index = 128*r + lane exactly).  The pipeline
algebra survives the packing:

  * DC blocker: the recurrence runs over FLATTENED sample order, which the
    packed rows preserve — the same two-matmul solve with a 128-wide decay
    matrix (lanes) and an r^128 row-carry matrix.
  * NCO: omega = -pi(nch-1)/nch has period 2*nch samples; nch | 64 makes
    128 an exact multiple, so the phase depends on the LANE alone — and
    since round 4 the stage is FOLDED OUT entirely (production default):
    the per-lane mix factor e^{-j*omega*l} lives in the DFT constant, the
    per-tap residual (-1)^((nch-1)J) in the tap panel, and the carried
    global phase cancels in the demod conjugate product (opts=("nco_ramp",)
    restores the explicit rotation).
  * PFB FIR (permuted taps, flagship_fused._permuted_tap_panel): a shift of
    J frames = a lane roll by (J%R)*nch plus a row shift by J//R, with the
    wrapped lanes taking one extra row of history — one `pltpu.roll` per
    distinct J%R, then cheap static row slices + lane-masked selects.
  * DFT: one (tileH,128)x(128,128) matmul against a block-diagonal
    diag(W,...,W) — both/all R frames' DFTs in a single full-width MXU pass
    (bf16_3x split as in flagship_fused).
  * FM demod: the previous frame is a lane roll by nch with the first slot
    wrapping to the previous row.

External semantics (state pytree aside) match flagship_fused_step: complex
(n,) or cu8 input, audio (nch, n/nch) float32 output; same DSP chain as
dcBlocker >> PFBChannelizer >> PerChannel(FMDemod) (reference
apps/SoapySDR.hs:208-226 + Liquid.chs — see ops/pfb.py citations).

Constraints: nch must divide 64; tileF % (2*R) == 0.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pfb import pfb_dft_matrix, pfb_offset
from ..nco import phase_ramp, phase_increment
from .bf16x3 import split_bf16, split_bf16_np, cdot3, cdot3_kara
from .pfb_fused import _atan2
from .flagship_fused import (_permuted_tap_panel, _row_carry_matrix,
                             _powvec, _row_decay_col, _dc_diff_panels,
                             _dc_pg_row, _dc_solve_pair, _dc_solve_stacked,
                             _dc_solve_pair_hier, _hier_group)

__all__ = ["flagship_fused_wide_init", "flagship_fused_wide_step"]

_TWO_PI = 2.0 * np.pi
_LANES = 128

# Trace-time markers for opt-gate activation (tests/probes read this to
# assert a requested variant path actually compiled — jit caching means a
# marker appears only when the config traces, so clear() before the call
# under test).  Today: "dc_split_active" / "dc_split_inactive".
_trace_log: set = set()


@functools.lru_cache(maxsize=None)
def _wide_tap_panel(nch: int, m: int, as_db: float) -> np.ndarray:
    """(L+1, 128) T̂ duplicated across the R frame slots."""
    That = _permuted_tap_panel(nch, m, as_db)  # (L+1, nch)
    return np.tile(That, (1, _LANES // nch))


@functools.lru_cache(maxsize=None)
def _lane_phase(nch: int) -> np.ndarray:
    """(128,) complex128 e^{−jω·ℓ} — the NCO mix factor at lane ℓ (the
    kernel rotates by e^{−jθ}: sre = re·cosθ + im·sinθ, sim = im·cosθ −
    re·sinθ).

    The flagship NCO's phase at sample index s is ω·s with
    ω = −π(nch−1)/nch (pfb_offset); its period 2·nch divides 128 for every
    nch | 64, so with the wide packing (s = 128·row + ℓ) the phase depends
    on the LANE alone: θ(row, ℓ) = ω·ℓ (mod 2π).  That makes the whole NCO
    stage a per-lane constant rotation — folded into the kernel's other
    constants (the PRODUCTION default since round 4; opts=("nco_ramp",)
    restores the explicit rotation — see _wide_dft/_wide_tap_panel_fold)."""
    omega = pfb_offset(nch)
    ell = np.arange(_LANES, dtype=np.float64)
    return np.exp(-1j * np.mod(omega * ell, 2.0 * np.pi))


@functools.lru_cache(maxsize=None)
def _wide_tap_panel_fold(nch: int, m: int, as_db: float) -> np.ndarray:
    """Tap panel with the NCO fold's per-tap correction (the production
    default; the explicit-ramp path uses the unfolded panel).

    With the NCO folded out of the sample stream, the FIR runs on x̂ (pre-
    rotation) instead of ŝ = x̂·e^{−jωs} (the kernel mixes DOWN by e^{−jθ});
    a tap J frames back carries the residual e^{+jω·J·nch} =
    (−1)^{(nch−1)·J} — REAL, so the FIR stays two real fma chains.  The
    remaining per-lane factor e^{−jωℓ} commutes with the whole
    (real-tapped) FIR and is folded into the DFT matrix."""
    That = _wide_tap_panel(nch, m, as_db).copy()
    J = np.arange(That.shape[0])
    sign = np.where((((nch - 1) * J) % 2) == 0, 1.0, -1.0).astype(np.float32)
    return That * sign[:, None]


@functools.lru_cache(maxsize=None)
def _wide_dft_blockdiag(nch: int, fold: bool) -> np.ndarray:
    """(128, 128) complex128 block-diagonal diag(Ŵ, ..., Ŵ); with
    ``fold`` each row ℓ additionally carries the NCO lane mix factor
    e^{−jωℓ} (see _lane_phase — constant, so the rotation costs zero
    kernel ops)."""
    W = pfb_dft_matrix(nch).astype(np.complex128)
    q = np.arange(nch)
    Whet = W[(nch - q) % nch, :]  # (nch, nch)
    R = _LANES // nch
    blk = np.zeros((_LANES, _LANES), dtype=np.complex128)
    for a in range(R):
        blk[a * nch:(a + 1) * nch, a * nch:(a + 1) * nch] = Whet
    if fold:
        blk *= _lane_phase(nch)[:, None]
    return blk


@functools.lru_cache(maxsize=None)
def _wide_dft_kara(nch: int, fold: bool = False):
    """Karatsuba combination planes for cdot3_kara, packed lane-wise:
    (128, 384) hi and lo panels [Wre | Wim−Wre | Wre+Wim] (block-diagonal
    like _wide_dft)."""
    blk = _wide_dft_blockdiag(nch, fold)
    combos = (blk.real, blk.imag - blk.real, blk.real + blk.imag)
    his, los = [], []
    for comp in combos:
        hi, lo = split_bf16_np(np.ascontiguousarray(comp, dtype=np.float32))
        his.append(hi)
        los.append(lo)
    return np.concatenate(his, axis=1), np.concatenate(los, axis=1)


@functools.lru_cache(maxsize=None)
def _wide_dft(nch: int, fold: bool = False):
    """Block-diagonal diag(Ŵ, ..., Ŵ) (128x128), split into bf16 hi+lo
    planes per real/imag component (the 3-multiply scheme of
    flagship_fused._permuted_dft)."""
    blk = _wide_dft_blockdiag(nch, fold)
    return [split_bf16_np(np.ascontiguousarray(comp, dtype=np.float32))
            for comp in (blk.real, blk.imag)]


def _kernel(xre_ref, xim_ref, xnre_ref, xnim_ref, ramp_ref,
            mdT_hi_ref, mdT_lo_ref, S_ref,
            p128_ref, pg_ref, pN_ref, That_ref,
            wre_hi_ref, wre_lo_ref, wim_hi_ref, wim_lo_ref,
            phase_ref, hist_in_re_ref, hist_in_im_ref, scal_in_ref,
            audio_ref, hist_out_re_ref, hist_out_im_ref, scal_out_ref,
            hist_re_scr, hist_im_scr, ydc_re_scr, ydc_im_scr, scal_scr,
            *, nch, L, tileH, histrows, g_gain, a_row, hierB, inv_kf,
            u8_input=False, skip=(), opts=()):
    # ``skip`` is a static tuple of stage names compiled OUT of the kernel —
    # used ONLY by benchmarks/probe_ablation.py to attribute per-stage cost
    # on real hardware.  Empty (the default and every production call) leaves
    # the kernel bit-identical to the ungated build.
    i = pl.program_id(0)
    T = pl.num_programs(0)
    R = _LANES // nch

    @pl.when(i == 0)
    def _():
        hist_re_scr[:] = hist_in_re_ref[:]
        hist_im_scr[:] = hist_in_im_ref[:]
        for idx in range(4):
            scal_scr[idx] = scal_in_ref[idx]

    if "dc_pipe" in opts:
        # A/B gate (round 5): CROSS-GRID-STEP DC pipelining.  The DC solve is
        # a strict serial prefix of each tile's FIR→DFT→demod chain (~18% of
        # the kernel, ABLATION_r04) that split2 cannot overlap.  Here step i
        # instead (a) processes tile i from the ydc scratch its predecessor
        # filled, and (b) solves DC for tile i+1 (second input ref, index
        # i+1) — work with NO data dependence on (a)'s chains, so Mosaic's
        # scheduler may overlap DC's MXU/VPU passes with the demod chains.
        # Step 0 additionally fills the pipeline with DC(0).  Identical
        # algebra and solve order → audio bit-identical to production
        # (tests/test_flagship_fused_wide.py).
        assert not skip and not any(
            o in opts for o in ("dc_stack", "dc_split", "nco_ramp", "dc_dense"))

        def conv(ref):
            if u8_input:
                return ref[0].astype(jnp.int32).astype(jnp.float32) \
                    * jnp.float32(1.0 / 127.5) - 1.0
            return ref[0]

        def dc_of(xre, xim):
            col_prev_re = pltpu.roll(xre[:, _LANES - 1:_LANES], 1, axis=0)
            col_prev_im = pltpu.roll(xim[:, _LANES - 1:_LANES], 1, axis=0)
            row = jax.lax.broadcasted_iota(jnp.int32, (tileH, 1), 0)
            col_prev_re = jnp.where(row == 0, scal_scr[0], col_prev_re)
            col_prev_im = jnp.where(row == 0, scal_scr[1], col_prev_im)
            if hierB:
                yre, yim, g_re, g_im = _dc_solve_pair_hier(
                    xre, xim, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:],
                    p128_ref[:], pg_ref[:], col_prev_re, col_prev_im,
                    scal_scr[2], scal_scr[3], g_gain, tileH, hierB, a_row)
            else:
                yre, yim, g_re, g_im = _dc_solve_pair(
                    xre, xim, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:],
                    p128_ref[:], pg_ref[:], pN_ref[:], col_prev_re,
                    col_prev_im, scal_scr[2], scal_scr[3], g_gain, tileH)
            ydc_re_scr[:] = yre
            ydc_im_scr[:] = yim
            scal_scr[0] = xre[tileH - 1, _LANES - 1]
            scal_scr[1] = xim[tileH - 1, _LANES - 1]
            scal_scr[2] = g_re
            scal_scr[3] = g_im

        @pl.when(i == 0)
        def _():
            dc_of(conv(xre_ref), conv(xim_ref))   # pipeline fill: DC(0)

        # current tile's DC output (filled by the previous step / the fill)
        sre = ydc_re_scr[:]
        sim = ydc_im_scr[:]

        @pl.when(i < T - 1)
        def _():
            dc_of(conv(xnre_ref), conv(xnim_ref))  # DC(i+1), overlappable
    elif "dc_stack" not in opts:
        # production per-component conversion + DC solve (difference-folded
        # decay matmul, identical algebra to flagship_fused._dc_solve_pair,
        # 128 wide); the stacked experiment below measured ~9% slower
        # (benchmarks/probe_kernel_opts.py)
        if u8_input:
            k_scale = jnp.float32(1.0 / 127.5)
            xre = xre_ref[0].astype(jnp.int32).astype(jnp.float32) * k_scale - 1.0
            xim = xim_ref[0].astype(jnp.int32).astype(jnp.float32) * k_scale - 1.0
        else:
            xre = xre_ref[0]  # (tileH, 128)
            xim = xim_ref[0]

        if "dc" not in skip:
            col_prev_re = pltpu.roll(xre[:, _LANES - 1:_LANES], 1, axis=0)
            col_prev_im = pltpu.roll(xim[:, _LANES - 1:_LANES], 1, axis=0)
            row = jax.lax.broadcasted_iota(jnp.int32, (tileH, 1), 0)
            col_prev_re = jnp.where(row == 0, scal_scr[0], col_prev_re)
            col_prev_im = jnp.where(row == 0, scal_scr[1], col_prev_im)

            dc_ablate = tuple(s[3:] for s in skip if s.startswith("dc_"))
            hierB2 = _hier_group(tileH // 2) if tileH % 2 == 0 else None
            if "dc_split" in opts:
                # dc_split needs a hier group for the HALF tile: tileH/2 must
                # be a multiple of 128 with >= 2 groups, i.e. tileH >= 512
                # (tileF >= 1024 at nch=64).  Below that the gate silently
                # measured production-vs-production — record activation at
                # trace time so A/B harnesses and tests can assert it fired.
                _trace_log.add("dc_split_active"
                               if (hierB and hierB2 and not dc_ablate)
                               else "dc_split_inactive")
            if ("dc_split" in opts and hierB and hierB2 and not dc_ablate):
                # dc_split (A/B gate): solve the DC recurrence per HALF with
                # the carry threaded between halves.  The full-tile solve
                # finishes before any FIR starts, serializing an ~18% stage
                # (ABLATION_r04); per-half, DC(h1)'s x-only matmuls carry no
                # dependence on h0 (only the thin g-carry does), so the
                # scheduler can overlap them with FIR(h0)'s VPU passes.
                # Same algebra, different blocking — ~1e-6-class diffs,
                # like hier-vs-dense (tolerance test).
                H2 = tileH // 2
                g_re, g_im = scal_scr[2], scal_scr[3]
                halves = []
                for h in range(2):
                    cp_re = col_prev_re[h * H2:(h + 1) * H2]
                    cp_im = col_prev_im[h * H2:(h + 1) * H2]
                    yh_re, yh_im, g_re, g_im = _dc_solve_pair_hier(
                        xre[h * H2:(h + 1) * H2], xim[h * H2:(h + 1) * H2],
                        mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:],
                        p128_ref[:], pg_ref[:], cp_re, cp_im,
                        g_re, g_im, g_gain, H2, hierB2, a_row)
                    halves.append((yh_re, yh_im))
                ydc_re = jnp.concatenate([halves[0][0], halves[1][0]], axis=0)
                ydc_im = jnp.concatenate([halves[0][1], halves[1][1]], axis=0)
                glast_re, glast_im = g_re, g_im
            elif hierB and not dc_ablate:
                ydc_re, ydc_im, glast_re, glast_im = _dc_solve_pair_hier(
                    xre, xim, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:],
                    p128_ref[:], pg_ref[:], col_prev_re,
                    col_prev_im, scal_scr[2], scal_scr[3], g_gain, tileH,
                    hierB, a_row)
            else:
                # dc_* sub-ablation always measures the DENSE solve parts
                ydc_re, ydc_im, glast_re, glast_im = _dc_solve_pair(
                    xre, xim, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:],
                    p128_ref[:], pg_ref[:], pN_ref[:], col_prev_re,
                    col_prev_im, scal_scr[2], scal_scr[3], g_gain, tileH,
                    ablate=dc_ablate)
        else:
            ydc_re, ydc_im = xre, xim
            glast_re, glast_im = scal_scr[2], scal_scr[3]
        x_last_re = xre[tileH - 1, _LANES - 1]
        x_last_im = xim[tileH - 1, _LANES - 1]
    else:
        # experimental stacked panel: x_re over x_im along sublanes, so the
        # u8 conversion and every DC pass run ONCE on (2·tileH, 128) —
        # measured SLOWER on chip (see _dc_solve_stacked's verdict)
        if u8_input:
            Xi = jnp.concatenate([xre_ref[0].astype(jnp.int32),
                                  xim_ref[0].astype(jnp.int32)], axis=0)
            X = Xi.astype(jnp.float32) * jnp.float32(1.0 / 127.5) - 1.0
        else:
            X = jnp.concatenate([xre_ref[0], xim_ref[0]], axis=0)

        if "dc" not in skip:
            ydc_re, ydc_im, glast_re, glast_im = _dc_solve_stacked(
                X, mdT_hi_ref[:], mdT_lo_ref[:], S_ref[:], p128_ref[:],
                pg_ref[:], pN_ref[:], scal_scr[0], scal_scr[1],
                scal_scr[2], scal_scr[3], g_gain, tileH)
        else:
            ydc_re, ydc_im = X[:tileH], X[tileH:]
            glast_re, glast_im = scal_scr[2], scal_scr[3]
        x_last_re = X[tileH - 1, _LANES - 1]
        x_last_im = X[2 * tileH - 1, _LANES - 1]

    if "dc_pipe" in opts:
        pass  # sre/sim already loaded from the pipelined ydc scratch
    elif "nco_ramp" in opts and "nco" not in skip:
        # legacy explicit NCO pre-shift: one constant ramp row (nch | 64 ⇒
        # period | 128) — reachable via opts=("nco_ramp",) for A/B
        # reproduction (KERNEL_NCOFOLD_r04 / KERNEL_SPLIT2FOLD_r04)
        theta = ramp_ref[:] + phase_ref[0, 0]  # (1, 128), broadcast over rows
        cth = jnp.cos(theta)
        sth = jnp.sin(theta)
        sre = ydc_re * cth + ydc_im * sth
        sim = ydc_im * cth - ydc_re * sth
    else:
        # PRODUCTION DEFAULT since round 4 (the NCO fold): the stage is
        # compiled out entirely — the per-lane mix factor e^{−jωℓ} lives in
        # the DFT constant (_wide_dft(fold=True)), the per-tap residual
        # (−1)^{(nch−1)J} in the tap panel (_wide_tap_panel_fold), and the
        # carried global phase cancels in the demod's conjugate product.
        # Saves 4 VPU passes/sample; measured +8.4% median END-TO-END
        # together with split2 (KERNEL_SPLIT2FOLD_r04, 10 scan-paired
        # rounds; fold alone was within window noise, KERNEL_NCOFOLD_r04).
        sre, sim = ydc_re, ydc_im

    # ---- PFB branch FIR over packed frame panels ----
    ext_re = jnp.concatenate([hist_re_scr[:], sre], axis=0)  # (histrows+tileH, 128)
    ext_im = jnp.concatenate([hist_im_scr[:], sim], axis=0)
    # One pre-shifted panel per distinct frame-slot shift s = J % R, with the
    # wrapped-lane row borrow APPLIED once — the J-loop below is then pure
    # static row slice + mul + add (the wrap select used to run per tap,
    # spending ~2 extra VPU passes/sample per s≠0 tap).
    # shifted[s][k] = ŝ_ext shifted by s frame slots, valid for rows k ≥ 1:
    #   lanes < s·nch take the lane-rolled previous row, others the current.
    base = histrows - 1

    def fir_part(ext_re, ext_im, outrows):
        if "fir" not in skip:
            shifts = sorted({J % R for J in range(L + 1)})
            nrows = ext_re.shape[0]
            shifted = {0: (ext_re, ext_im)}
            for s in shifts:
                if s:
                    r_re = pltpu.roll(ext_re, s * nch, axis=1)
                    r_im = pltpu.roll(ext_im, s * nch, axis=1)
                    wrap = jax.lax.broadcasted_iota(
                        jnp.int32, (nrows - 1, _LANES), 1) < s * nch
                    shifted[s] = (jnp.where(wrap, r_re[:-1], r_re[1:]),
                                  jnp.where(wrap, r_im[:-1], r_im[1:]))

            That = That_ref[:]
            # output rows j in [0, outrows]: ext row k = histrows-1+j (row 0
            # is the pre-row carrying the previous frame for the demod seed)
            ure = uim = None
            for J in range(L + 1):
                s = J % R
                rb = J // R
                tj = That[J][None, :]
                Pre, Pim = shifted[s]
                # shifted[s] rows are offset by one (entry k-1 holds row k)
                off = base - rb - (1 if s else 0)
                seg_re = Pre[off: off + outrows + 1] * tj
                seg_im = Pim[off: off + outrows + 1] * tj
                ure = seg_re if ure is None else ure + seg_re
                uim = seg_im if uim is None else uim + seg_im
        else:
            ure = ext_re[base: base + outrows + 1]
            uim = ext_im[base: base + outrows + 1]
        return ure, uim

    def dft_part(ure, uim):
        if "dft" not in skip:
            # ---- block-diagonal DFT, bf16_3x ----
            ure_p = split_bf16(ure)
            uim_p = split_bf16(uim)
            if "dft_kara" in opts:
                # 3-multiply complex: wre refs carry the packed (128, 384)
                # combination planes [Wre | Wim-Wre | Wre+Wim]; wim refs are
                # dummies (see the step function)
                usum_p = split_bf16(ure + uim)
                Whi, Wlo = wre_hi_ref[:], wre_lo_ref[:]
                dre, dim = cdot3_kara(
                    ure_p, uim_p, usum_p,
                    (Whi[:, 0:_LANES], Wlo[:, 0:_LANES]),
                    (Whi[:, _LANES:2 * _LANES], Wlo[:, _LANES:2 * _LANES]),
                    (Whi[:, 2 * _LANES:3 * _LANES],
                     Wlo[:, 2 * _LANES:3 * _LANES]))
            else:
                dre, dim = cdot3(ure_p, uim_p, wre_hi_ref[:], wre_lo_ref[:],
                                 wim_hi_ref[:], wim_lo_ref[:])
        else:
            dre, dim = ure, uim
        return dre, dim

    def demod_part(dre, dim, outrows):
        if "demod" not in skip:
            # ---- FM demod: previous frame = lane roll by nch, slot 0 wraps
            # to the previous row ----
            dre_roll = pltpu.roll(dre, nch, axis=1)
            dim_roll = pltpu.roll(dim, nch, axis=1)
            wrap1 = jax.lax.broadcasted_iota(
                jnp.int32, (outrows, _LANES), 1) < nch
            pre_re = jnp.where(wrap1, dre_roll[:-1], dre_roll[1:])
            pre_im = jnp.where(wrap1, dim_roll[:-1], dim_roll[1:])
            cur_re = dre[1:]
            cur_im = dim[1:]
            cre = cur_re * pre_re + cur_im * pre_im
            cim = cur_im * pre_re - cur_re * pre_im
            if "atan2" not in skip:
                at_ablate = tuple(s[5:] for s in skip if s.startswith("atan_"))
                return (_atan2(cim, cre, fast_recip="fast_atan" in opts,
                               ablate=at_ablate)
                        * jnp.float32(inv_kf))
            return (cre + cim) * jnp.float32(inv_kf)
        return dre[1:] + dim[1:]

    def fir_dft_demod(ext_re, ext_im, outrows):
        """FIR → DFT → FM demod over ``ext`` rows → (outrows, 128) audio.

        ``ext`` must hold ``histrows + outrows`` rows (history prefix then
        fresh samples); output row j covers ext row base + j, with row j=0's
        demod seed coming from the pre-row.  Staged (fir/dft/demod parts)
        so the splitN default can run INDEPENDENT sub-tile chains and the
        interleave gate can emit them stage-major; a single full-tile call
        (opts=("split1",)) traces bit-identically to the old inlined
        form."""
        ure, uim = fir_part(ext_re, ext_im, outrows)
        dre, dim = dft_part(ure, uim)
        return demod_part(dre, dim, outrows)

    parts = 1 if "split1" in opts else (4 if "split4" in opts else 2)
    if parts > 1 and tileH % parts == 0 and tileH // parts >= histrows:
        # PRODUCTION DEFAULT since round 4 (parts=2): INDEPENDENT sub-tile
        # chains — FIR(h1) has no data dependence on DFT/demod(h0), so
        # Mosaic's scheduler is free to overlap h1's VPU passes with h0's
        # MXU matmuls (the single-chain body is one strict dependency
        # chain, which is why measured throughput tracked the SERIAL
        # roofline — docs/PERF.md §2c).  Same total op count, audio
        # bit-identical (tests); +8.4% median end-to-end with the NCO fold
        # (KERNEL_SPLIT2FOLD_r04).  Single-chain stays reachable via
        # opts=("split1",); tiles too small to split fall through to it;
        # opts=("split4",) deepens the pipeline to 4 chains (A/B gate).
        partH = tileH // parts
        if "interleave" in opts:
            # stage-major emission (A/B gate): FIR of every chain first,
            # then every DFT, then every demod — identical dataflow and
            # bit-identical audio, but if Mosaic list-schedules in emission
            # order this hands it the MXU/VPU overlap directly instead of
            # requiring a global reorder
            us = [fir_part(ext_re[h * partH: h * partH + histrows + partH],
                           ext_im[h * partH: h * partH + histrows + partH],
                           partH) for h in range(parts)]
            ds = [dft_part(*u) for u in us]
            for h in range(parts):
                audio_ref[0, h * partH:(h + 1) * partH] = demod_part(
                    *ds[h], partH)
        else:
            for h in range(parts):
                lo = h * partH
                audio_ref[0, lo:lo + partH] = fir_dft_demod(
                    ext_re[lo:lo + histrows + partH],
                    ext_im[lo:lo + histrows + partH], partH)
    else:
        audio_ref[0] = fir_dft_demod(ext_re, ext_im, tileH)

    # ---- carry updates ----
    hist_re_scr[:] = ext_re[tileH:]
    hist_im_scr[:] = ext_im[tileH:]
    if "dc_pipe" not in opts:  # dc_pipe updates scal inside dc_of
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


def _histrows(nch: int, m: int) -> int:
    L = 2 * m
    R = _LANES // nch
    # deepest row reach: pre-row (j=0) with J=L and wrapped lanes reads
    # row (histrows-1) - L//R - 1 — keep that >= 0
    return L // R + 2


def flagship_fused_wide_init(nch: int, m: int = 7):
    if 64 % nch:
        raise ValueError(f"wide layout requires nch | 64, got {nch}")
    h = _histrows(nch, m)
    return dict(
        phase=jnp.zeros((), jnp.float32),
        hist_re=jnp.zeros((h, _LANES), jnp.float32),
        hist_im=jnp.zeros((h, _LANES), jnp.float32),
        scal=jnp.zeros((4,), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("nch", "m", "as_db", "kf", "tileF",
                                             "dc_alpha", "interpret", "skip",
                                             "opts"))
def flagship_fused_wide_step(state, x, *, nch: int, m: int = 7,
                             as_db: float = 80.0, kf: float = 0.6,
                             tileF: int = 512, dc_alpha: float = 0.0005,
                             interpret: bool = False, skip: tuple = (),
                             opts: tuple = ()):
    """(state, x) → (state, audio (nch, n/nch) float32) — see module docstring.

    ``tileF`` counts FRAMES per grid tile (same meaning as
    flagship_fused_step); rows per tile is tileF//R with R = 128//nch.
    """
    if 64 % nch:
        raise ValueError(f"wide layout requires nch | 64, got {nch}")
    R = _LANES // nch
    if tileF % R:
        raise ValueError(f"tileF {tileF} must be a multiple of R={R}")
    tileH = tileF // R

    if isinstance(x, (tuple, list)):
        # plane pair (re, im): uint8 planes take the in-kernel-conversion
        # path; float32 planes feed the kernel directly (the sharded runner
        # and plane-native callers — no complex round-trip at all)
        xre_1d, xim_1d = x
        u8_input = xre_1d.dtype == jnp.uint8
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

    if isinstance(x, (tuple, list)):
        xre = xre_1d.reshape(T, tileH, _LANES)
        xim = xim_1d.reshape(T, tileH, _LANES)
    elif u8_input:
        pairs = x.reshape(n, 2)
        xre = pairs[:, 0].reshape(T, tileH, _LANES)
        xim = pairs[:, 1].reshape(T, tileH, _LANES)
    else:
        xre = jnp.real(x).reshape(T, tileH, _LANES)
        xim = jnp.imag(x).reshape(T, tileH, _LANES)

    omega = pfb_offset(nch)

    # NCO fold is the production default (round 4); opts=("nco_ramp",)
    # restores the explicit in-kernel rotation ("nco_fold" is accepted as a
    # redundant alias so recorded A/B command lines stay reproducible)
    fold = "nco_ramp" not in opts
    # folded kernels never read the ramp: ship a (1, 1) dummy, not 512 B
    ramp = (jnp.zeros((1, 1), jnp.float32) if fold else
            jnp.asarray(phase_ramp(float(omega), _LANES).reshape(1, _LANES)))
    That = jnp.asarray(_wide_tap_panel_fold(nch, m, as_db) if fold
                       else _wide_tap_panel(nch, m, as_db))
    if "dft_kara" in opts:
        kara_hi_np, kara_lo_np = _wide_dft_kara(nch, fold)
        wre_hi = jnp.asarray(kara_hi_np, dtype=jnp.bfloat16)
        wre_lo = jnp.asarray(kara_lo_np, dtype=jnp.bfloat16)
        wim_hi = jnp.zeros((1, 1), jnp.bfloat16)   # unused dummies
        wim_lo = jnp.zeros((1, 1), jnp.bfloat16)
    else:
        (wre_hi_np, wre_lo_np), (wim_hi_np, wim_lo_np) = _wide_dft(nch, fold)
        wre_hi = jnp.asarray(wre_hi_np, dtype=jnp.bfloat16)
        wre_lo = jnp.asarray(wre_lo_np, dtype=jnp.bfloat16)
        wim_hi = jnp.asarray(wim_hi_np, dtype=jnp.bfloat16)
        wim_lo = jnp.asarray(wim_lo_np, dtype=jnp.bfloat16)
    mdT_hi_np, mdT_lo_np = _dc_diff_panels(r, g, _LANES)
    mdT_hi = jnp.asarray(mdT_hi_np, dtype=jnp.bfloat16)
    mdT_lo = jnp.asarray(mdT_lo_np, dtype=jnp.bfloat16)
    pg = jnp.asarray(_dc_pg_row(r, g, _LANES))  # (1, 128): g·a^i
    a_row = float(r ** _LANES)
    # PRODUCTION DEFAULT since round 3: the two-level row-carry solve
    # measured +17% end-to-end (KERNEL_OPTS_r03.json, scan-paired, healthy
    # window) — the dense solve stays reachable via opts=("dc_dense",) for
    # reproduction/A-B.  Small tiles (no valid group size) use dense
    # automatically.
    use_hier = "dc_dense" not in opts and "dc_stack" not in opts and \
        not any(s.startswith("dc_") for s in skip)   # dc_* sub-ablation
    hierB = _hier_group(tileH) if use_hier else None  # measures the dense parts
    if "dc_split" in opts and not (
            hierB and tileH % 2 == 0 and _hier_group(tileH // 2)):
        # requested variant would silently no-op (see the kernel's gate) —
        # an A/B at this tile measures production vs production
        import warnings
        warnings.warn(
            f"dc_split requested but INACTIVE at tileH={tileH}: the per-half "
            f"solve needs _hier_group(tileH//2), i.e. tileH >= 512 "
            f"(tileF >= {512 * (_LANES // nch)} at nch={nch})", stacklevel=2)
    # dc_hier swaps the dense row-carry matrix for the (B+1, B) group one
    S = jnp.asarray(_row_carry_matrix(a_row, hierB if hierB else tileH))
    p128 = jnp.asarray(_powvec(r, _LANES))
    # hier solve never reads the dense decay column (see flagship_fused)
    pN = (jnp.zeros((1, 1), jnp.float32) if hierB
          else jnp.asarray(_row_decay_col(a_row, tileH)))
    phase = state["phase"].reshape(1, 1)
    h = _histrows(nch, m)

    kernel = functools.partial(
        _kernel, nch=nch, L=L, tileH=tileH, histrows=h, g_gain=g,
        a_row=a_row, hierB=hierB, inv_kf=1.0 / (_TWO_PI * kf),
        u8_input=u8_input, skip=tuple(skip), opts=tuple(opts))

    const2 = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                        memory_space=pltpu.VMEM)
    if "dc_pipe" in opts:
        # second view of the input planes at grid index i+1 (clamped): the
        # pipelined DC solve reads the NEXT tile while this tile demods
        xn_re, xn_im = xre, xim
        nxt = lambda i: (jnp.minimum(i + 1, T - 1), 0, 0)
        xn_spec = [pl.BlockSpec((1, tileH, _LANES), nxt,
                                memory_space=pltpu.VMEM)] * 2
        ydc_scr = [pltpu.VMEM((tileH, _LANES), jnp.float32)] * 2
    else:
        xn_re = xn_im = jnp.zeros((1, 1, 1),
                                  jnp.uint8 if u8_input else jnp.float32)
        xn_spec = [const2((1, 1, 1))] * 2
        ydc_scr = [pltpu.VMEM((1, 1), jnp.float32)] * 2
    if "dc_pipe" in opts and not interpret:
        # the second input window (double-buffered) + two f32 ydc scratches
        # push the kernel ~1.7 MB past Mosaic's 16 MB default scoped-vmem
        # limit at the production tileF=4096 (measured r05); v5e has 128 MB
        # of VMEM, so raise the guardrail for this variant only
        extra = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    else:
        extra = {}
    audio, hist_re, hist_im, scal = pl.pallas_call(
        kernel,
        grid=(T,),
        **extra,
        in_specs=[
            pl.BlockSpec((1, tileH, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tileH, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *xn_spec,
            const2(tuple(ramp.shape)),
            const2((_LANES, _LANES)), const2((_LANES, _LANES)),
            const2(tuple(S.shape)),
            const2((1, _LANES)), const2((1, _LANES)), const2(tuple(pN.shape)),
            const2((L + 1, _LANES)),
            const2(tuple(wre_hi.shape)), const2(tuple(wre_lo.shape)),
            const2(tuple(wim_hi.shape)), const2(tuple(wim_lo.shape)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            const2((h, _LANES)), const2((h, _LANES)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tileH, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const2((h, _LANES)), const2((h, _LANES)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, tileH, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((h, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((h, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((4,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, _LANES), jnp.float32),
            pltpu.VMEM((h, _LANES), jnp.float32),
            *ydc_scr,
            pltpu.SMEM((4,), jnp.float32),
        ],
        interpret=interpret,
    )(xre, xim, xn_re, xn_im, ramp, mdT_hi, mdT_lo, S, p128, pg, pN, That,
      wre_hi, wre_lo, wim_hi, wim_lo, phase,
      state["hist_re"], state["hist_im"], state["scal"])

    new_phase = jnp.mod(state["phase"] + phase_increment(float(omega), int(n)),
                        np.float32(_TWO_PI))
    new_state = dict(phase=new_phase, hist_re=hist_re, hist_im=hist_im, scal=scal)
    if "audio_frames" in opts:
        # frame-major (n/nch, nch) output: skips the channel-major transpose
        # (an XLA pass over the whole audio, ~half the io/layout floor per
        # ABLATION_r03) — for consumers that accept either layout (host
        # sinks transpose as a free numpy view after download)
        return new_state, audio.reshape(F, nch)
    return new_state, audio.reshape(F, nch).T
