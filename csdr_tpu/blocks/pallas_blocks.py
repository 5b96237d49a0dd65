"""Blocks backed by fused Pallas TPU kernels."""

from __future__ import annotations

from fractions import Fraction

from ..core.block import Block
from ..ops.pallas.pfb_fused import (
    channelized_fm_pallas_init,
    channelized_fm_pallas_step,
)

__all__ = ["PallasChannelizedFM"]


class PallasChannelizedFM(Block):
    """Fused PFB channelizer + per-channel FM demod (ops/pallas/pfb_fused.py).
    Drop-in for `firpfbch_channelizer(nch) >> PerChannel(fm_demodulator(kf))`
    — same state semantics, one HBM pass."""

    def __init__(self, nch: int, kf: float = 0.6, m: int = 7, as_db: float = 80.0,
                 tileF: int = 1024, interpret: bool = False):
        self.nch, self.kf, self.m, self.as_db = nch, kf, m, as_db
        self.tileF = tileF
        self.interpret = interpret
        self.rate = Fraction(1, nch)
        self.granule = nch * tileF  # F must divide into whole tiles
        self.name = f"pallas_pfb_fm({nch})"

    def init(self):
        return channelized_fm_pallas_init(self.nch, self.m)

    def apply(self, state, x):
        return channelized_fm_pallas_step(
            state, x, nch=self.nch, m=self.m, as_db=self.as_db, kf=self.kf,
            tileF=self.tileF, interpret=self.interpret)
