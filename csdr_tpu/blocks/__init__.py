"""DSP block library — Block-protocol equivalents of every liquid-dsp stage
the reference exports (/root/reference/src/ComposableSDR/Liquid.chs:2-25,
inventory in SURVEY.md §2b).

Reference export          → here
------------------------------------------------------------------
resampler r as            → resampler(rate, as_db)
symTracker m k            → sym_tracker(m, k)            (models/symsync.py)
symSyncC m k              → sym_sync_c(m, k)             (models/symsync.py)
symSyncR k m beta nf      → sym_sync_r(k, m, beta, nf)   (models/symsync.py)
mixUp f / mixDown f       → mix_up(f) / mix_down(f)
fmDemodulator kf          → fm_demodulator(kf)
wbFMDemodulator qr d      → wbfm_demodulator(quad_rate, decim)
stereoFMDecoder           → models/stereo.py
amDemodulator             → am_demodulator()
fskDemodulator m k bw     → fsk_demodulator(m, k, bw)
gmskDemodulator m k bw    → gmsk_demodulator(m, k, bw)
fmDemWithSync k           → fm_dem_with_sync(k)          (models/symsync.py)
firDecimator m            → fir_decimator(m)
automaticGainControl t    → automatic_gain_control(threshold_db)
firFilterR / RNyquist     → fir_filter_rnyquist(k, m, beta, mu)
iirFilter n fc ...        → iir_filter(order, fc)
iirCFilter n fc ...       → iir_cfilter(order, fc)
dcBlocker                 → dc_blocker()
firpfbchChannelizer n     → firpfbch_channelizer(nch)
realToComplex             → real_to_complex()
complexToReal             → complex_to_real()
firFilterCKaiser n fc ... → fir_filter_c_kaiser(n, fc, as_db, mu)
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp

from ..core.block import Block, Lambda, TailStateBlock, chain
from ..core.sharding import CH, TIME
from ..ops import agc as agc_ops
from ..ops import demod as demod_ops
from ..ops import fir as fir_ops
from ..ops import hilbert as hilbert_ops
from ..ops import iir as iir_ops
from ..ops import nco as nco_ops
from ..ops import pfb as pfb_ops
from ..ops import resamp as resamp_ops
from ..utils import firdes, iirdes

_TWO_PI = 2.0 * np.pi

__all__ = [
    "mix_up", "mix_down", "fm_demodulator", "am_demodulator", "fsk_demodulator",
    "ssb_demodulator", "cw_demodulator",
    "fir_decimator", "fir_interpolator", "automatic_gain_control", "dc_blocker",
    "iir_filter", "iir_cfilter", "fir_filter_c_kaiser", "fir_filter",
    "fir_filter_rnyquist", "real_to_complex", "complex_to_real",
    "firpfbch_channelizer", "resampler", "wbfm_demodulator", "u8_to_iq",
]


class U8ToIQ(Block):
    """Interleaved unsigned-8-bit IQ (RTL-SDR native 'cu8' capture format) →
    complex64, converted ON DEVICE so the host→device wire carries 2 bytes
    per sample instead of 8.  Capability extension: the reference reads CF32
    only and needs rtl_sdr captures pre-converted."""

    rate = Fraction(1, 2)
    granule = 2
    name = "u8_to_iq"
    stateless = True

    def apply(self, state, x):
        f = (x.astype(jnp.float32) - 127.5) * np.float32(1.0 / 127.5)
        pairs = f.reshape(-1, 2)
        return state, jax.lax.complex(pairs[:, 0], pairs[:, 1])


def u8_to_iq() -> Block:
    return U8ToIQ()


class Mixer(Block):
    """NCO frequency shift (reference mixUp/mixDown, Liquid.chs:744-809).
    ``omega`` in radians/sample."""

    def __init__(self, omega: float, up: bool):
        self.omega = float(omega)
        self.up = up
        self.name = f"mix_{'up' if up else 'down'}({omega:.6g})"

    def init(self):
        return jnp.zeros((), dtype=jnp.float32)

    def apply(self, state, x):
        return nco_ops.mix_stream(state, x, self.omega, self.up)

    def shard_apply(self, state, x, ctx):
        """The NCO phase is affine in the global sample index, so each time
        device starts at the carried phase plus a static per-device offset
        (float64-precomputed) — no collective needed."""
        nloc = x.shape[0]
        table = jnp.asarray(nco_ops.phase_table(self.omega, nloc, ctx.dt))
        local_phase = jnp.mod(state + table[ctx.ti()], np.float32(_TWO_PI))
        _, y = nco_ops.mix_stream(local_phase, x, self.omega, self.up)
        inc = np.float32(nco_ops.phase_increment(self.omega, nloc * ctx.dt))
        new_phase = jnp.mod(state + inc, np.float32(_TWO_PI))
        return new_phase, y

    def shard_validate(self, nloc, ctx):
        return nloc


def mix_up(omega: float) -> Block:
    return Mixer(omega, up=True)


def mix_down(omega: float) -> Block:
    return Mixer(omega, up=False)


class FMDemod(TailStateBlock):
    """FM demodulator (reference fmDemodulator, Liquid.chs:303-334).
    State = previous input sample ⇒ a 1-sample halo under sharding."""

    tail_len = 1
    fuse_zero_tail = False  # init is ones (zero phase), not zeros

    def __init__(self, kf: float):
        self.kf = float(kf)
        self.name = f"fm_demod({kf})"

    def init(self):
        return jnp.ones((1,), dtype=jnp.complex64)  # previous sample, zero phase

    def apply(self, state, x):
        return demod_ops.freqdem_stream(state, x, self.kf)


def fm_demodulator(kf: float) -> Block:
    return FMDemod(kf)


class AMDemod(Block):
    """AM envelope demodulator, mod index 0.8, DSB, carrier present
    (reference amDemodulator, Liquid.chs:439-469)."""

    stateless = True

    def __init__(self, mod_index: float = 0.8, suppressed: bool = False):
        self.mod_index = mod_index
        self.suppressed = suppressed
        self.name = "am_demod"

    def apply(self, state, x):
        return state, demod_ops.amdem(x, self.mod_index, self.suppressed)


def ssb_demodulator(side: str = "usb", bandwidth: float = 0.0125,
                    as_db: float = 60.0, gain: float = 2.0,
                    n: int | None = None) -> Block:
    """Single-sideband demodulator — capability extension; the reference's
    demod surface (Liquid.chs / apps/SoapySDR.hs:19-29) stops at FM/AM/FSK.

    A tuned SSB signal at complex baseband is (half of) the analytic signal
    of the audio: USB occupies (0, +B], LSB [-B, 0).  Demodulation is a
    one-sided complex band-pass (kaiser low-pass of cutoff B/2, frequency-
    shifted by ±B/2 — still linear-phase, group delay (n-1)/2) followed by
    the real part; ``gain=2`` undoes the ½ from Re[A·e^{jωct}] mixing.
    ``bandwidth`` = B normalized to the sample rate (liquid convention);
    default 0.0125 is 3 kHz audio at fs=240k.  Shards like any FIR (the
    band-pass is a TailStateBlock; Re is stateless)."""
    side = side.lower()
    if side not in ("usb", "lsb"):
        raise ValueError(f"ssb_demodulator side must be 'usb'/'lsb', got {side!r}")
    if not (0.0 < bandwidth < 0.5):
        raise ValueError(f"ssb bandwidth {bandwidth} not in (0, 0.5) of fs")
    if n is None:
        n = firdes.kaiser_filter_len(max(0.1 * bandwidth, 0.002), as_db)
    h = firdes.kaiser_lowpass(n, bandwidth / 2.0, as_db) * gain
    shift = bandwidth / 2.0 if side == "usb" else -bandwidth / 2.0
    k = np.arange(n) - (n - 1) / 2.0
    taps = (h * np.exp(2j * np.pi * shift * k)).astype(np.complex64)
    bp = FIRFilter(taps, complex_input=True, name=f"ssb_{side}({bandwidth:.4g})")
    re = Lambda(lambda x: x.real, name="re")
    return chain(bp, re)


def cw_demodulator(bandwidth: float = 0.002, pitch: float = 0.0029,
                   as_db: float = 60.0) -> Block:
    """CW (Morse) demodulator — capability extension.  The tuned carrier
    sits at DC; a narrow kaiser low-pass (±bandwidth/2) isolates it, a BFO
    shift moves it to an audible ``pitch``, and the real part is the audio
    tone.  Both normalized to the sample rate (defaults: 500 Hz-wide filter,
    ~700 Hz side-tone at fs=240k).  Shards: FIR halo + NCO affine phase."""
    if not (0.0 < bandwidth < 0.5):
        raise ValueError(f"cw bandwidth {bandwidth} not in (0, 0.5) of fs")
    n = firdes.kaiser_filter_len(max(0.5 * bandwidth, 0.001), as_db)
    lp = FIRFilter(firdes.kaiser_lowpass(n, bandwidth / 2.0, as_db),
                   complex_input=True, name=f"cw_lp({bandwidth:.4g})")
    bfo = mix_up(_TWO_PI * pitch)
    re = Lambda(lambda x: x.real, name="re")
    return chain(lp, bfo, re)


def am_demodulator(mod_index: float = 0.8, suppressed: bool = False) -> Block:
    return AMDemod(mod_index, suppressed)


class FSKDemod(Block):
    """M-FSK demodulator: k input samples → 1 symbol (uint32)
    (reference fskDemodulator, Liquid.chs:336-382)."""

    stateless = True

    def __init__(self, m_bits: int, k: int, bandwidth: float):
        self.m_bits, self.k, self.bandwidth = m_bits, k, bandwidth
        self.rate = Fraction(1, k)
        self.granule = k
        self.name = f"fsk_demod(m={m_bits},k={k})"

    def apply(self, state, x):
        return state, demod_ops.fskdem_block(x, self.m_bits, self.k, self.bandwidth)


def fsk_demodulator(m_bits: int, k: int, bandwidth: float) -> Block:
    return FSKDemod(m_bits, k, bandwidth)


class FIRFilter(TailStateBlock):
    """Same-rate streaming FIR from an explicit tap vector."""

    def __init__(self, taps: np.ndarray, complex_input: bool, name: str = "fir",
                 scale: float = 1.0, strategy: str = "auto"):
        self.taps = np.asarray(taps) * scale
        self.tail_len = len(self.taps) - 1
        self.complex_input = complex_input
        self.strategy = strategy
        self.name = name

    def init(self):
        dt = jnp.complex64 if (self.complex_input or np.iscomplexobj(self.taps)) else jnp.float32
        return jnp.zeros((len(self.taps) - 1,), dtype=dt)

    def apply(self, state, x):
        return fir_ops.fir_stream(self.taps, state, x, self.strategy)

    def group_delay(self, f: float = 0.0) -> float:
        return firdes.group_delay(self.taps.real if np.iscomplexobj(self.taps) else self.taps, f)


def fir_filter(taps, complex_input=True, **kw) -> FIRFilter:
    return FIRFilter(taps, complex_input, **kw)


def fir_filter_c_kaiser(n: int, fc: float, as_db: float = 60.0, mu: float = 0.0) -> FIRFilter:
    """Complex FIR, kaiser design, unity passband (the reference composes
    liquid's raw design with set_scale(2·fc) — Liquid.chs:889-895; our design
    folds the scale in)."""
    taps = firdes.kaiser_lowpass(n, fc, as_db, mu)
    return FIRFilter(taps, complex_input=True, name=f"fir_kaiser({n},{fc:.4g})")


def fir_filter_rnyquist(k: int, m: int, beta: float, mu: float = 0.0) -> FIRFilter:
    """Real GMSK-RX matched filter (reference firFilterRNyquist,
    Liquid.chs:935-941).  Our design bakes unity tx·rx cascade gain at the
    symbol instant (firdes.gmsk_rx) instead of the reference's post-hoc 1/k
    scale; ``mu`` is the fractional-sample timing offset, applied as an
    exact frequency-domain delay."""
    taps = firdes.fractional_delay(firdes.gmsk_rx(k, m, max(beta, 0.1)), mu,
                                   extend=True)
    return FIRFilter(taps, complex_input=False, scale=1.0, name=f"fir_gmskrx(k={k},m={m})")


class FIRDecim(TailStateBlock):
    """Kaiser decimating FIR (reference firDecimator, Liquid.chs:471-501:
    semi-length 10, 60 dB)."""

    def __init__(self, m: int, semilen: int = 10, as_db: float = 60.0,
                 complex_input: bool = False):
        self.m = m
        self.taps = firdes.firdecim_kaiser(m, semilen, as_db)
        self.tail_len = len(self.taps) - 1
        self.complex_input = complex_input
        self.rate = Fraction(1, m)
        self.granule = m
        self.name = f"fir_decim({m})"

    def init(self):
        dt = jnp.complex64 if self.complex_input else jnp.float32
        return jnp.zeros((len(self.taps) - 1,), dtype=dt)

    def apply(self, state, x):
        return fir_ops.fir_decim_stream(self.taps, self.m, state, x)


def fir_decimator(m: int, **kw) -> Block:
    if m == 1:
        return Lambda(lambda x: x, name="fir_decim(1)")
    return FIRDecim(m, **kw)


class FIRInterp(TailStateBlock):
    """Kaiser interpolating FIR (capability extension; liquid has firinterp
    but the reference CLI never uses it)."""

    def __init__(self, p: int, semilen: int = 10, as_db: float = 60.0,
                 complex_input: bool = True):
        self.p = p
        h = firdes.firdecim_kaiser(p, semilen, as_db) * p
        self.taps = h
        self.tail_len = -(-len(h) // p) - 1
        self.complex_input = complex_input
        self.rate = Fraction(p, 1)
        self.name = f"fir_interp({p})"

    def init(self):
        dt = jnp.complex64 if self.complex_input else jnp.float32
        Lsub = -(-len(self.taps) // self.p)
        return jnp.zeros((Lsub - 1,), dtype=dt)

    def apply(self, state, x):
        return fir_ops.fir_interp_stream(self.taps, self.p, state, x)


def fir_interpolator(p: int, **kw) -> Block:
    return FIRInterp(p, **kw)


class DCBlocker(Block):
    """IQ DC-notch (reference dcBlocker α=0.0005, Liquid.chs:575-589,
    applied at the head of every CLI flow)."""

    def __init__(self, alpha: float = 0.0005, complex_input: bool = True):
        self.alpha = alpha
        self.complex_input = complex_input
        self.name = "dc_blocker"

    def init(self):
        return iir_ops.dc_blocker_init(self.complex_input)

    def apply(self, state, x):
        return iir_ops.dc_blocker_stream(state, x, self.alpha)

    def shard_apply(self, state, x, ctx):
        return iir_ops.dc_blocker_shard_stream(state, x, ctx, self.alpha)

    def shard_validate(self, nloc, ctx):
        return nloc


def dc_blocker(alpha: float = 0.0005, complex_input: bool = True) -> Block:
    return DCBlocker(alpha, complex_input)


class IIRFilter(Block):
    """IIR prototype filter (reference iirFilter/iirCFilter,
    Liquid.chs:600-651).  The reference CLI only ever builds the Butterworth
    lowpass (create_prototype 0 0 0), but the exported surface carries the
    full liquid family — honored here: ``ftype`` selects
    butter/cheby1/cheby2/ellip/bessel, ``f0`` ≠ 0 selects a bandpass centered
    there, ``ap``/``as_db`` set ripple/attenuation where the family uses
    them.  Evaluated as parallel one-pole partial fractions (ops/iir.py)."""

    def __init__(self, order: int, fc: float, complex_input: bool,
                 ftype: str = "butter", f0: float = 0.0, ap: float = 1.0,
                 as_db: float = 40.0):
        self.order, self.fc = order, fc
        self.complex_input = complex_input
        sos = iirdes.prototype_sos(ftype, order, fc, f0, ap, as_db)
        self.casc = iirdes.sos_to_onepole(sos, not complex_input)
        self.name = f"iir_{ftype}({order},{fc:.4g}" + \
            (f",f0={f0:.4g})" if f0 else ")")

    def init(self):
        return iir_ops.onepole_cascade_init(self.casc, self.complex_input)

    def apply(self, state, x):
        return iir_ops.onepole_cascade_stream(self.casc, state, x)

    def shard_apply(self, state, x, ctx):
        """Identical cascade algebra with distributed primitives injected:
        halo-exchanged FIR numerator history + closed-form cross-device pole
        carries (core/sharding.ShardCtx)."""
        def dist_linrec(v, a, c):
            y, _, new_carry = ctx.linrec(v, a, c)
            return y, new_carry

        return iir_ops.onepole_cascade_stream(
            self.casc, state, x, linrec_fn=dist_linrec, fir_fn=ctx.fir)

    def shard_validate(self, nloc, ctx):
        if nloc < 2:
            raise ValueError(f"{self.name}: local segment too short")
        return nloc


def iir_filter(order: int, fc: float, f0: float = 0.0, ap: float = 10.0,
               as_db: float = 10.0, ftype: str = "butter") -> Block:
    """Real IIR (reference iirFilter, Liquid.chs:644-651).  f0/ap/as_db are
    now honored (f0 → bandpass center; ap/as_db → cheby/ellip parameters;
    Butterworth ignores ap/as_db exactly as liquid does)."""
    return IIRFilter(order, fc, complex_input=False, ftype=ftype, f0=f0,
                     ap=ap, as_db=as_db)


def iir_cfilter(order: int, fc: float, f0: float = 0.0, ap: float = 10.0,
                as_db: float = 10.0, ftype: str = "butter") -> Block:
    """Complex IIR (reference iirCFilter, Liquid.chs:602-608) — full
    prototype surface, see IIRFilter."""
    return IIRFilter(order, fc, complex_input=True, ftype=ftype, f0=f0,
                     ap=ap, as_db=as_db)


class AGC(Block):
    """AGC with squelch (reference automaticGainControl,
    Liquid.chs:658-728: bw 0.1, signal level 1e-3, timeout 1000)."""

    def __init__(self, squelch_threshold_db: float | None, bandwidth: float = 0.1,
                 signal_level: float = 1e-3):
        self.squelch_threshold_db = squelch_threshold_db
        self.bandwidth = bandwidth
        self.signal_level = signal_level
        self.name = f"agc({squelch_threshold_db})"

    def init(self):
        return agc_ops.agc_init(self.signal_level)

    def apply(self, state, x):
        return agc_ops.agc_stream(state, x, self.bandwidth, self.squelch_threshold_db)

    def shard_apply(self, state, x, ctx):
        return agc_ops.agc_shard_stream(state, x, ctx, self.bandwidth,
                                        self.squelch_threshold_db)

    def shard_validate(self, nloc, ctx):
        return nloc


def automatic_gain_control(threshold_db: float) -> Block:
    return AGC(threshold_db)


class RealToComplex(TailStateBlock):
    """Real→IQ Hilbert 2:1 (reference realToComplex, Liquid.chs:503-537)."""

    rate = Fraction(1, 2)
    granule = 2
    name = "real_to_complex"
    tail_len = len(hilbert_ops.hilbert_taps()) - 1

    def init(self):
        return hilbert_ops.real_to_complex_init()

    def apply(self, state, x):
        return hilbert_ops.real_to_complex_stream(state, x)


class ComplexToReal(TailStateBlock):
    """IQ→real Hilbert 1:2 (reference complexToReal, Liquid.chs:539-546)."""

    rate = Fraction(2, 1)
    name = "complex_to_real"
    tail_len = -(-len(hilbert_ops.hilbert_taps()) // 2) - 1

    def init(self):
        return hilbert_ops.complex_to_real_init()

    def apply(self, state, x):
        return hilbert_ops.complex_to_real_stream(state, x)


def real_to_complex() -> Block:
    return RealToComplex()


def complex_to_real() -> Block:
    return ComplexToReal()


class PFBChannelizer(Block):
    """Polyphase filterbank channelizer with the reference's NCO pre-shift
    (reference firpfbchChannelizer, Liquid.chs:811-866): input (n,) complex →
    output (nch, n/nch); channel k centered at 2π(k − (nch−1)/2)/nch."""

    def __init__(self, nch: int, m: int = 7, as_db: float = 80.0):
        self.nch, self.m, self.as_db = nch, m, as_db
        self.rate = Fraction(1, nch)  # per-channel sample rate
        self.granule = nch
        self.name = f"pfb_channelizer({nch})"

    def init(self):
        return (jnp.zeros((), dtype=jnp.float32), pfb_ops.pfb_analyze_init(self.nch, self.m))

    def apply(self, state, x):
        phase, pfb_state = state
        phase, shifted = nco_ops.mix_stream(phase, x, pfb_ops.pfb_offset(self.nch), up=False)
        pfb_state, y = pfb_ops.pfb_analyze_stream(pfb_state, shifted, self.nch, self.m, self.as_db)
        return (phase, pfb_state), y

    def shard_apply(self, state, x, ctx):
        """Time-sharded channelizer, channel-sharded output: the NCO pre-shift
        uses the indexed-phase trick (no collective), the polyphase history is
        one raw-sample halo of length L·nch−1 from the left neighbor, and each
        device multiplies only its column shard of the DFT matrix — so the
        (nch, F) output lands P('ch','time') with no further communication."""
        from ..ops.constants import jnp_const

        phase, (hist_x, hist_v) = state
        nch, m = self.nch, self.m
        L = 2 * m
        nloc = x.shape[0]
        F = nloc // nch
        omega = pfb_ops.pfb_offset(nch)

        table = jnp.asarray(nco_ops.phase_table(omega, nloc, ctx.dt))
        local_phase = jnp.mod(phase + table[ctx.ti()], np.float32(_TWO_PI))
        _, xs = nco_ops.mix_stream(local_phase, x, omega, up=False)
        inc = np.float32(nco_ops.phase_increment(omega, nloc * ctx.dt))
        new_phase = jnp.mod(phase + inc, np.float32(_TWO_PI))

        # carried polyphase state == the last L·nch−1 raw (shifted) samples:
        # hist_v holds the last L−1 frames (reversed), hist_x the nch−1 spill
        H = L * nch - 1
        carried_tail = jnp.concatenate([hist_v[:, ::-1].reshape(-1), hist_x])
        halo = ctx.left_halo(xs, carried_tail, H)

        xfull = jnp.concatenate([halo[(L - 1) * nch:], xs])  # (nch−1) + nloc
        v = xfull[: F * nch].reshape(F, nch)[:, ::-1]
        vprev = halo[: (L - 1) * nch].reshape(L - 1, nch)[:, ::-1]
        vfull = jnp.concatenate([vprev, v], axis=0)          # (F + L − 1, nch)

        taps = pfb_ops.pfb_taps(nch, m, self.as_db)
        u = None
        for l in range(L):
            seg = vfull[L - 1 - l: L - 1 - l + F]
            term = seg * jnp.asarray(taps[l])[None, :]
            u = term if u is None else u + term

        W = jnp_const(pfb_ops.pfb_dft_matrix(nch))
        if ctx.dc > 1:
            nch_loc = nch // ctx.dc
            W = jax.lax.dynamic_slice_in_dim(W, ctx.ci() * nch_loc, nch_loc, axis=1)
        d = (u @ W).T  # (nch_local, F)

        new_hist_x = ctx.from_last_time(xs[-(nch - 1):]) if nch > 1 else hist_x
        new_hist_v = ctx.from_last_time(v[-(L - 1):])
        return (new_phase, (new_hist_x, new_hist_v)), d

    def shard_validate(self, nloc, ctx):
        if ctx.layout != TIME:
            raise ValueError(f"{self.name}: channelizer input must be a 1-D "
                             f"time-sharded stream")
        if nloc % self.nch:
            raise ValueError(f"{self.name}: local segment {nloc} not a "
                             f"multiple of nch={self.nch}")
        H = 2 * self.m * self.nch - 1
        if nloc < H:
            raise ValueError(f"{self.name}: local segment {nloc} shorter than "
                             f"the {H}-sample polyphase halo")
        if self.nch % ctx.dc:
            raise ValueError(f"{self.name}: nch={self.nch} not divisible by "
                             f"the {ctx.dc}-way channel mesh axis")
        return nloc // self.nch

    def shard_layout(self, in_layout):
        return CH


def firpfbch_channelizer(nch: int, **kw) -> Block:
    return PFBChannelizer(nch, **kw)


class RationalResampler(TailStateBlock):
    """Polyphase P/Q resampler.  Its phase schedule restarts every Q input
    samples, so with a Q-aligned local segment the state is purely the
    (L−1)-sample input tail — time-shardable like any FIR."""

    def __init__(self, P: int, Q: int, as_db: float = 60.0, complex_input: bool = True):
        self.P, self.Q, self.as_db = P, Q, as_db
        self.tail_len = resamp_ops.rational_taps(P, Q, as_db).shape[1] - 1
        self.complex_input = complex_input
        self.rate = Fraction(P, Q)
        self.granule = Q
        self.name = f"resamp({P}/{Q})"

    def init(self):
        dt = jnp.complex64 if self.complex_input else jnp.float32
        return resamp_ops.rational_resample_init(self.P, self.Q, self.as_db, dt)

    def apply(self, state, x):
        return resamp_ops.rational_resample_stream(state, x, self.P, self.Q, self.as_db)


class HalfbandDecim(TailStateBlock):
    """2:1 half-band decimator — one stage of the multi-stage resampler."""

    rate = Fraction(1, 2)
    granule = 2

    def __init__(self, as_db: float = 60.0, semilen: int = 12, complex_input: bool = True):
        self.taps = firdes.halfband_kaiser(semilen, as_db) * 2.0
        self.tail_len = len(self.taps) - 1
        self.complex_input = complex_input
        self.name = "halfband_decim"

    def init(self):
        dt = jnp.complex64 if self.complex_input else jnp.float32
        return jnp.zeros((len(self.taps) - 1,), dtype=dt)

    def apply(self, state, x):
        return fir_ops.fir_decim_stream(self.taps, 2, state, x)


def resampler(rate: float, as_db: float = 60.0, complex_input: bool = True) -> Block:
    """Arbitrary-rate resampler (reference `resampler r as`,
    Liquid.chs:100-117 wrapping msresamp_crcf): half-band 2:1 stages bring the
    remaining ratio into (0.5, 1]; a rational polyphase stage finishes.  The
    requested rate is realized exactly as a rational (SURVEY.md §7 hard part
    #1: static shapes beat data-dependent output counts)."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    stages: list[Block] = []
    r = float(rate)
    while r <= 0.5:
        stages.append(HalfbandDecim(as_db, complex_input=complex_input))
        r *= 2.0
    frac = resamp_ops.rational_approx(r)
    if frac != 1:
        stages.append(RationalResampler(frac.numerator, frac.denominator, as_db,
                                        complex_input))
    if not stages:
        return Lambda(lambda x: x, name="resamp(1)")
    return chain(*stages) if len(stages) > 1 else stages[0]


def wbfm_demodulator(quad_rate: float, decim: int) -> Block:
    """Wideband FM receiver chain (reference wbFMDemodulator,
    Liquid.chs:653-656): freqdem(kf=0.6) → order-2 Butterworth de-emphasis at
    5 kHz/quad_rate → kaiser decimator."""
    deemph = iir_filter(2, 5000.0 / quad_rate)
    return chain(fm_demodulator(0.6), deemph, fir_decimator(decim))
