"""FM stereo (pilot-tone) decoder.

Reference: stereoFMDecoder (/root/reference/src/ComposableSDR/Liquid.chs:
1004-1079), constants at :1010-1017 — pilot 19 kHz, PLL bw 9 Hz, pilot FIR
half-band 800 Hz of length quadRate/1350, audio FIRs 15 kHz, de-emphasis
order 2 @ 5 kHz, stereo gain 2, group-delay compensation via Trans.delay.

The reference regenerates the 38 kHz subcarrier with a per-sample PLL
(fmsPll, Liquid.chs:959-1002).  TPU design: the pilot is already isolated by
the band-pass, so its *analytic phase is available in closed form* — the
subcarrier is (pilot/|pilot|)², computed for every sample in parallel (the
open-loop equivalent of a PLL with the reference's 9 Hz bandwidth; both
reject noise through the same 800 Hz pilot filter).  Everything else is the
same graph: matrix (L+R ± (L−R)), de-emphasis, decimation, interleave.

Input: FM-demodulated composite (real, quad_rate), i.e. downstream of
fmDemodulator 0.8 like the reference's DeFMS flow (apps/SoapySDR.hs:261-264).
Output: (2, n/decim) array — row 0 = L, row 1 = R.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from ..core.block import Block
from ..ops import fir as fir_ops
from ..ops import iir as iir_ops
from ..ops.nco import phase_ramp, phase_increment
from ..utils import firdes, iirdes

__all__ = ["StereoFMDecoder", "stereo_fm_decoder"]

_TWO_PI = 2.0 * np.pi


def fms_pll_scan(p_a: jnp.ndarray, state, omega: float, bw: float):
    """Reference-faithful per-sample pilot PLL (liquid fmsPll,
    Liquid.chs:959-1002): 2nd-order loop tracking the analytic pilot p_a,
    returning the regenerated 38 kHz subcarrier e^{j2φ[n]}.

    This is the serial lax.scan counterpart of the default closed-form
    regeneration — available for fidelity comparisons (`pll_mode='scan'`);
    the open-loop path is the TPU-fast default.
    """
    import jax

    alpha = np.float32(4.0 * bw)        # proportional gain
    beta = np.float32(4.0 * bw * bw)    # integrator gain (critically damped-ish)
    omega = np.float32(omega)

    def step(carry, p):
        theta, freq = carry
        rot = jnp.exp(-1j * theta).astype(jnp.complex64)
        e = jnp.angle(p * rot)
        freq = freq + beta * e
        theta_n = theta + omega + freq + alpha * e
        return (jnp.mod(theta_n, np.float32(_TWO_PI)), freq), theta

    (theta, freq), thetas = jax.lax.scan(step, state, p_a)
    sub38 = jnp.exp(2j * thetas).astype(jnp.complex64)
    return (theta, freq), sub38


class StereoFMDecoder(Block):
    def __init__(self, quad_rate: float, decim: int,
                 pilot_hz: float = 19000.0,
                 pilot_fir_halfband_hz: float = 800.0,
                 audio_cutoff_hz: float = 15000.0,
                 deemph_order: int = 2, deemph_cutoff_hz: float = 5000.0,
                 stereo_gain: float = 2.0, pll_mode: str = "closed_form"):
        self.quad_rate = quad_rate
        self.decim = decim
        self.omega19 = _TWO_PI * pilot_hz / quad_rate
        nfir = int(round(quad_rate / 1350.0))
        self.h_pilot = firdes.kaiser_lowpass(nfir, pilot_fir_halfband_hz / quad_rate, 60.0)
        self.h_audio = firdes.kaiser_lowpass(nfir, audio_cutoff_hz / quad_rate, 60.0)
        self.gdelay = int(round(firdes.group_delay(self.h_pilot, 100.0 / quad_rate)))
        self.stereo_gain = stereo_gain
        self.pll_mode = pll_mode
        self.pll_bw = 9.0 / quad_rate  # reference kPLLBandwidthHz = 9 Hz
        self.deemph = iirdes.sos_to_onepole(
            iirdes.butter_sos(deemph_order, deemph_cutoff_hz / quad_rate), real_io=True)
        self.h_decim = (firdes.firdecim_kaiser(decim, 10, 60.0) if decim > 1 else None)
        self.rate = Fraction(1, decim)
        self.granule = decim
        self.name = f"stereo_fm({quad_rate:.0f},{decim})"

    def init(self):
        Kp = len(self.h_pilot)
        Ka = len(self.h_audio)
        st = dict(
            phase19=jnp.zeros((), jnp.float32),
            pilot_hist=jnp.zeros((Kp - 1,), jnp.complex64),
            delay_buf=jnp.zeros((self.gdelay,), jnp.float32),
            lpr_hist=jnp.zeros((Ka - 1,), jnp.float32),
            lmr_hist=jnp.zeros((Ka - 1,), jnp.complex64),
            deemph_l=iir_ops.onepole_cascade_init(self.deemph, False),
            deemph_r=iir_ops.onepole_cascade_init(self.deemph, False),
            pll=(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        )
        if self.h_decim is not None:
            Kd = len(self.h_decim)
            st["decim_l"] = jnp.zeros((Kd - 1,), jnp.float32)
            st["decim_r"] = jnp.zeros((Kd - 1,), jnp.float32)
        return st

    def apply(self, state, c):
        n = c.shape[0]
        s = dict(state)

        # --- pilot extraction: mixDown 19k → LPF (group delay gd) ---
        ramp = jnp.asarray(phase_ramp(self.omega19, int(n)))
        theta = s["phase19"] + ramp
        m19 = c.astype(jnp.complex64) * jnp.exp(-1j * theta).astype(jnp.complex64)
        s["pilot_hist"], pilot_bb = fir_ops.fir_stream(self.h_pilot, s["pilot_hist"], m19)
        s["phase19"] = jnp.mod(s["phase19"] + phase_increment(self.omega19, int(n)), _TWO_PI)

        # analytic pilot at the delayed time base: e^{+jω19(n−gd)}
        gd_phase = np.float32(np.mod(self.omega19 * self.gdelay, _TWO_PI))
        p_a = pilot_bb * jnp.exp(1j * (theta - gd_phase)).astype(jnp.complex64)
        if self.pll_mode == "scan":
            s["pll"], sub38 = fms_pll_scan(p_a, s["pll"], self.omega19, self.pll_bw)
        else:
            u = p_a / (jnp.abs(p_a) + 1e-12)
            sub38 = u * u  # e^{j(2ω19(n−gd)+2θp)} — regenerated 38 kHz subcarrier

        # --- delayed composite (group-delay compensation, Trans.delay) ---
        full = jnp.concatenate([s["delay_buf"], c])
        cd = full[:n]
        s["delay_buf"] = full[n:]

        # --- L−R: mix down by the subcarrier, 15 kHz LPF, ×2 ---
        lmr_in = cd.astype(jnp.complex64) * jnp.conj(sub38)
        s["lmr_hist"], lmr_bb = fir_ops.fir_stream(self.h_audio, s["lmr_hist"], lmr_in)
        lmr = np.float32(self.stereo_gain) * jnp.real(lmr_bb)

        # --- L+R: 15 kHz LPF of the delayed composite ---
        s["lpr_hist"], lpr = fir_ops.fir_stream(self.h_audio, s["lpr_hist"], cd)

        # --- matrix, de-emphasis, decimation ---
        left = lpr + lmr
        right = lpr - lmr
        s["deemph_l"], left = iir_ops.onepole_cascade_stream(self.deemph, s["deemph_l"], left)
        s["deemph_r"], right = iir_ops.onepole_cascade_stream(self.deemph, s["deemph_r"], right)
        if self.h_decim is not None:
            s["decim_l"], left = fir_ops.fir_decim_stream(self.h_decim, self.decim,
                                                          s["decim_l"], left)
            s["decim_r"], right = fir_ops.fir_decim_stream(self.h_decim, self.decim,
                                                           s["decim_r"], right)
        return s, jnp.stack([left, right])


def stereo_fm_decoder(quad_rate: float, decim: int, **kw) -> Block:
    return StereoFMDecoder(quad_rate, decim, **kw)
