"""AIS receiver — ITU-R M.1371 position reports from a GMSK baseband.

Capability extension beyond the reference (whose only offline decoder is the
helicopter FSK telemetry app, /root/reference/apps/HeliDecode.hs); AIS is the
same shape of problem at sea: 9600 baud GMSK (BT=0.4), NRZI, HDLC framing,
CRC-16/X-25, 168-bit position payloads.

Split like models/rds.py: the sample-rate part (GMSK demodulation to bit
levels) is a TPU Block chain (blocks/gmsk.py — FM discriminator, matched
filter, strided slicer; shards like any chain); the irregular, data-dependent
part (flag search, bit de-stuffing, CRC, field extraction) runs host-side on
the tiny 9.6 kb/s bit stream.

Wire conventions implemented (and used by the test encoder, so the chain is
validated end-to-end as an exact inverse pair):
  * NRZI: a zero data bit toggles the level, a one keeps it;
  * HDLC: frames delimited by 0x7E flags (01111110), a 0 stuffed after five
    consecutive 1s in data+FCS;
  * bytes transmitted LSB-first; FCS = CRC-16/X-25 over the de-stuffed data
    bytes, appended little-endian;
  * payload bit numbering (for field extraction) is the NMEA 6-bit armor
    order: each byte contributes its bits MSB-first.
"""

from __future__ import annotations

import numpy as np

from ..core.block import Block, chain
from ..blocks.gmsk import gmsk_demodulator, gmsk_mod

__all__ = [
    "ais_receiver", "decode_bits", "parse_payload",
    "crc16_x25", "nrzi_decode", "nrzi_encode",
    "make_position_report", "ais_burst_bits",
]

AIS_BAUD = 9600.0
_FLAG = "01111110"


def ais_receiver(sample_rate: float, m: int = 3, bt: float = 0.4) -> Block:
    """GMSK demod at 9600 baud → bit LEVELS (before NRZI decoding).
    ``sample_rate`` must be an integer multiple of 9600 (the usual SDR flow
    resamples the 25 kHz channel up/down to one)."""
    k = sample_rate / AIS_BAUD
    if abs(k - round(k)) > 1e-9 or round(k) < 2:
        raise ValueError(
            f"AIS needs sample_rate = n·9600 with n ≥ 2, got {sample_rate}")
    return chain(gmsk_demodulator(m, int(round(k)), bt))


# ---- host-side bit layer ---------------------------------------------------

def nrzi_decode(levels: np.ndarray) -> np.ndarray:
    """NRZI: decoded bit = 1 iff the level did NOT change (0 = transition)."""
    lv = np.asarray(levels).astype(np.uint8)
    prev = np.concatenate([lv[:1], lv[:-1]])
    return (lv == prev).astype(np.uint8)


def nrzi_encode(bits: np.ndarray, start_level: int = 0) -> np.ndarray:
    toggles = 1 - np.asarray(bits, dtype=np.uint8)
    levels = (start_level + np.cumsum(toggles)) & 1
    return levels.astype(np.uint8)


def crc16_x25(data: bytes) -> int:
    """CRC-16/X-25 (reflected 0x1021 = 0x8408, init 0xFFFF, xorout 0xFFFF) —
    the HDLC FCS AIS uses."""
    crc = 0xFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
    return crc ^ 0xFFFF


def _destuff(bits: str) -> str | None:
    """Remove the 0 stuffed after every run of five 1s; None if a run of six
    1s appears (corrupt — only flags may contain it)."""
    out = []
    ones = 0
    i = 0
    while i < len(bits):
        b = bits[i]
        out.append(b)
        if b == "1":
            ones += 1
            if ones == 5:
                i += 1  # skip the stuffed 0
                if i < len(bits) and bits[i] == "1":
                    return None
                ones = 0
        else:
            ones = 0
        i += 1
    return "".join(out)


def decode_bits(levels: np.ndarray) -> list[dict]:
    """Full host-side decode: NRZI → flag search → de-stuff → CRC →
    parse_payload for every valid frame found."""
    bits = "".join("1" if b else "0" for b in nrzi_decode(levels))
    msgs = []
    flags = [m for m in range(len(bits)) if bits[m:m + 8] == _FLAG]
    for a, b in zip(flags, flags[1:]):
        seg = bits[a + 8:b]
        if len(seg) < 8 * (2 + 1):  # at least one data byte + FCS
            continue
        d = _destuff(seg)
        if d is None or len(d) % 8:
            continue
        # bytes arrive LSB-first on the wire
        data = bytes(int(d[i:i + 8][::-1], 2) for i in range(0, len(d), 8))
        payload, fcs = data[:-2], data[-2:]
        if crc16_x25(payload) != fcs[0] | (fcs[1] << 8):
            continue
        # NMEA bit order: each payload byte MSB-first
        pb = "".join(f"{byte:08b}" for byte in payload)
        msgs.append(parse_payload(pb))
    return msgs


def _i(bits: str, lo: int, n: int) -> int:
    return int(bits[lo:lo + n], 2)


def _s(bits: str, lo: int, n: int) -> int:
    v = _i(bits, lo, n)
    return v - (1 << n) if v & (1 << (n - 1)) else v


def parse_payload(pb: str) -> dict:
    """Field extraction for message types 1/2/3 (class-A position report,
    ITU-R M.1371 table 45); other types return type+mmsi only."""
    msg = {"type": _i(pb, 0, 6), "mmsi": _i(pb, 8, 30)}
    if msg["type"] in (1, 2, 3) and len(pb) >= 144:
        msg.update(
            sog_kn=_i(pb, 50, 10) / 10.0,
            lon_deg=_s(pb, 61, 28) / 600000.0,
            lat_deg=_s(pb, 89, 27) / 600000.0,
            cog_deg=_i(pb, 116, 12) / 10.0,
        )
    return msg


# ---- test-vector encoder (exact inverse of the decoder) --------------------

def make_position_report(mmsi: int, lat_deg: float, lon_deg: float,
                         sog_kn: float = 0.0, cog_deg: float = 0.0,
                         msg_type: int = 1) -> str:
    """168-bit class-A position payload (NMEA bit order)."""
    def u(v, n):
        return format(int(v) & ((1 << n) - 1), f"0{n}b")

    pb = (u(msg_type, 6) + u(0, 2) + u(mmsi, 30) + u(0, 4) + u(128, 8)
          + u(round(sog_kn * 10), 10) + u(0, 1)
          + u(round(lon_deg * 600000), 28) + u(round(lat_deg * 600000), 27)
          + u(round(cog_deg * 10), 12) + u(511, 9) + u(60, 6)
          + u(0, 2) + u(0, 3) + u(0, 1) + u(0, 19))
    assert len(pb) == 168, len(pb)
    return pb


def ais_burst_bits(payload_bits: str, training: int = 24) -> np.ndarray:
    """Payload → over-the-air bit LEVELS: training 0101…, flag, stuffed
    LSB-first data+FCS, flag, all NRZI-encoded."""
    data = bytes(int(payload_bits[i:i + 8], 2)
                 for i in range(0, len(payload_bits), 8))
    fcs = crc16_x25(data)
    wire_bytes = data + bytes([fcs & 0xFF, fcs >> 8])
    raw = "".join(f"{byte:08b}"[::-1] for byte in wire_bytes)  # LSB-first
    stuffed = []
    ones = 0
    for b in raw:
        stuffed.append(b)
        if b == "1":
            ones += 1
            if ones == 5:
                stuffed.append("0")
                ones = 0
        else:
            ones = 0
    frame = "01" * (training // 2) + _FLAG + "".join(stuffed) + _FLAG
    bits = np.frombuffer(frame.encode(), np.uint8) - ord("0")
    return nrzi_encode(bits)


def ais_modulate(levels: np.ndarray, k: int, m: int = 3,
                 bt: float = 0.4) -> np.ndarray:
    """GMSK-modulate bit levels at k samples/bit (test oracle transmitter)."""
    return gmsk_mod(np.asarray(levels, np.int64), k, m, bt)
