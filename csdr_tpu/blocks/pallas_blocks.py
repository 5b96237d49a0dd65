"""Blocks backed by fused Pallas TPU kernels.

Set CSDR_PALLAS_INTERPRET=1 to force interpreter mode (CPU testing)."""

from __future__ import annotations

import os


def _interp_default(flag: bool) -> bool:
    return flag or bool(os.environ.get("CSDR_PALLAS_INTERPRET"))

from fractions import Fraction

from ..core.block import Block
from ..ops.pallas.pfb_fused import (
    channelized_fm_pallas_init,
    channelized_fm_pallas_step,
)

__all__ = ["PallasChannelizedFM", "FlagshipFused"]


class FlagshipFused(Block):
    """dcBlocker >> PFB >> PerChannel(FMDemod) as ONE Pallas kernel pass
    (ops/pallas/flagship_fused.py)."""

    def __init__(self, nch: int, kf: float = 0.6, m: int = 7, as_db: float = 80.0,
                 tileF: int | None = None, dc_alpha: float = 0.0005,
                 interpret: bool = False):
        from fractions import Fraction
        from ..ops.pallas.flagship_fused import flagship_fused_init, flagship_fused_step
        from ..utils import autotune

        interpret = _interp_default(interpret)
        if tileF is None:  # best-known tile from the autotune cache
            tileF = autotune.lookup("flagship_fused", nch)

        self._init = lambda: flagship_fused_init(nch, m)
        self._step = lambda st, x: flagship_fused_step(
            st, x, nch=nch, m=m, as_db=as_db, kf=kf, tileF=tileF,
            dc_alpha=dc_alpha, interpret=interpret)
        self.rate = Fraction(1, nch)
        self.granule = nch * tileF
        self.name = f"flagship_fused({nch})"

    def init(self):
        return self._init()

    def apply(self, state, x):
        return self._step(state, x)


class PallasChannelizedFM(Block):
    """Fused PFB channelizer + per-channel FM demod (ops/pallas/pfb_fused.py).
    Drop-in for `firpfbch_channelizer(nch) >> PerChannel(fm_demodulator(kf))`
    — same state semantics, one HBM pass."""

    def __init__(self, nch: int, kf: float = 0.6, m: int = 7, as_db: float = 80.0,
                 tileF: int | None = None, interpret: bool = False):
        from ..utils import autotune
        self.nch, self.kf, self.m, self.as_db = nch, kf, m, as_db
        if tileF is None:
            tileF = autotune.lookup("pfb_fused", nch)
        self.tileF = tileF
        self.interpret = _interp_default(interpret)
        self.rate = Fraction(1, nch)
        self.granule = nch * tileF  # F must divide into whole tiles
        self.name = f"pallas_pfb_fm({nch})"

    def init(self):
        return channelized_fm_pallas_init(self.nch, self.m)

    def apply(self, state, x):
        return channelized_fm_pallas_step(
            state, x, nch=self.nch, m=self.m, as_db=self.as_db, kf=self.kf,
            tileF=self.tileF, interpret=self.interpret)
