"""APRS receiver — AFSK1200 (Bell 202) AX.25 UI frames from NBFM audio.

Capability extension (the reference decodes one FSK telemetry format,
apps/HeliDecode.hs; terrestrial packet radio is the ham-band analogue):
1200-baud AFSK with mark 1200 Hz / space 2200 Hz, NRZI, HDLC, CRC-16/X-25
(the bit layer shared with AIS — models/hdlc.py), AX.25 addressing.

Device side (``afsk1200_receiver``): a fully vectorized non-coherent dual
tone discriminator — two NCO mixers bring each tone to DC, a one-bit
moving-average FIR integrates it, and the score is |mark| − |space|;
composed from the existing Mixer/FIRFilter blocks inside one
AFSKDiscriminator, so it shards under a mesh like any chain.  Host side:
bit-center sampling aligned to the dominant transition phase, then the HDLC
layer and AX.25 address parsing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.block import Block, chain
from ..blocks import FIRFilter, mix_down
from .hdlc import crc16_x25, frame_to_wire_bits, hdlc_frames, sample_bits

__all__ = [
    "afsk1200_receiver", "bits_from_score", "decode_score", "parse_ax25",
    "make_ax25_ui", "aprs_burst_bits", "afsk_modulate", "APRS_BAUD",
]

APRS_BAUD = 1200.0
F_MARK, F_SPACE = 1200.0, 2200.0
_TWO_PI = 2.0 * np.pi


class AFSKDiscriminator(Block):
    """Dual-tone non-coherent discriminator: two NCO correlators (mark,
    space), a one-bit moving-average FIR each, score = |mark| − |space|.
    Composes the existing Mixer/FIRFilter blocks internally (their NCO
    affine-phase and FIR-halo sharding rules carry over directly), so the
    block shards like any chain while keeping a single TIME output layout.
    Tones default to Bell 202 (APRS); models/rtty.py reuses it with the
    170 Hz-shift RTTY pair."""

    def __init__(self, sample_rate: float, k: int,
                 f_mark: float = F_MARK, f_space: float = F_SPACE,
                 name: str | None = None):
        ma = np.ones(k) / k
        self.parts = tuple(
            (mix_down(_TWO_PI * f / sample_rate),
             FIRFilter(ma, complex_input=True, name=f"ma({f:g})"))
            for f in (f_mark, f_space))
        self.name = name or f"afsk1200(fs={sample_rate:g})"

    def init(self):
        return tuple((mx.init(), fr.init()) for mx, fr in self.parts)

    def _run(self, state, x, step):
        new_state, mags = [], []
        for (mx, fr), (sm, sf) in zip(self.parts, state):
            sm, y = step(mx, sm, x)
            sf, y = step(fr, sf, y)
            new_state.append((sm, sf))
            mags.append(jnp.abs(y))
        return tuple(new_state), mags[0] - mags[1]

    def apply(self, state, x):
        return self._run(state, x, lambda b, s, v: b.apply(s, v))

    def shard_apply(self, state, x, ctx):
        return self._run(state, x,
                         lambda b, s, v: b.shard_apply(s, v, ctx.clone()))

    def shard_validate(self, nloc, ctx):
        for mx, fr in self.parts:
            mx.shard_validate(nloc, ctx.clone())
            fr.shard_validate(nloc, ctx.clone())
        return nloc


def afsk1200_receiver(sample_rate: float) -> Block:
    """f32 NBFM audio at ``sample_rate`` (n×1200) → mark/space score at the
    same rate (>0 = mark = bit level 1)."""
    k = sample_rate / APRS_BAUD
    if abs(k - round(k)) > 1e-9 or round(k) < 8:
        raise ValueError(
            f"AFSK1200 needs sample_rate = n·1200 with n ≥ 8, got {sample_rate}")
    return chain(AFSKDiscriminator(sample_rate, int(round(k))))


def bits_from_score(score: np.ndarray, sample_rate: float) -> np.ndarray:
    """Bit-center sampling (the shared open-loop bit clock,
    models/hdlc.sample_bits)."""
    return sample_bits(score, int(round(sample_rate / APRS_BAUD)))


def decode_score(score: np.ndarray, sample_rate: float) -> list[dict]:
    levels = bits_from_score(score, sample_rate)
    out = []
    for frame in hdlc_frames(levels):
        msg = parse_ax25(frame)
        if msg is not None:
            out.append(msg)
    return out


def parse_ax25(frame: bytes) -> dict | None:
    """AX.25 UI frame: 7-byte address units (callsign chars shifted left 1,
    SSID byte's LSB terminates the list), control, PID, info text."""
    addrs = []
    i = 0
    while True:
        if i + 7 > len(frame) or len(addrs) > 10:
            return None
        unit = frame[i:i + 7]
        call = "".join(chr(b >> 1) for b in unit[:6]).strip()
        ssid = (unit[6] >> 1) & 0x0F
        addrs.append(f"{call}-{ssid}" if ssid else call)
        i += 7
        if unit[6] & 1:
            break
    if len(addrs) < 2 or i + 2 > len(frame):
        return None
    return {"dst": addrs[0], "src": addrs[1], "via": addrs[2:],
            "control": frame[i], "pid": frame[i + 1],
            "info": frame[i + 2:].decode("latin1")}


# ---- test-vector encoder (exact inverse of the decoder) --------------------

def make_ax25_ui(src: str, dst: str, info: str, via: tuple = ()) -> bytes:
    def unit(call: str, last: bool) -> bytes:
        base, _, ssid = call.partition("-")
        b = bytes((ord(c) << 1) & 0xFF for c in f"{base:<6}"[:6])
        return b + bytes([((int(ssid or 0) & 0x0F) << 1) | 0x60
                          | (1 if last else 0)])

    addrs = [dst, src] + list(via)
    hdr = b"".join(unit(a, i == len(addrs) - 1) for i, a in enumerate(addrs))
    return hdr + bytes([0x03, 0xF0]) + info.encode("latin1")


def aprs_burst_bits(frame: bytes, training: int = 48) -> np.ndarray:
    """AX.25 frame bytes → over-the-air bit levels (shared HDLC encoder)."""
    return frame_to_wire_bits(frame, training)


def afsk_modulate(levels: np.ndarray, sample_rate: float) -> np.ndarray:
    """Continuous-phase Bell-202 tone synthesis: level 1 = 1200 Hz mark,
    level 0 = 2200 Hz space (test oracle transmitter)."""
    k = int(round(sample_rate / APRS_BAUD))
    freqs = np.where(np.repeat(np.asarray(levels, np.uint8), k) == 1,
                     F_MARK, F_SPACE)
    phase = _TWO_PI * np.cumsum(freqs) / sample_rate
    return np.sin(phase).astype(np.float32)
