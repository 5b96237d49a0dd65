"""Blocks backed by fused Pallas TPU kernels.

Set CSDR_PALLAS_INTERPRET=1 to force interpreter mode (CPU testing)."""

from __future__ import annotations

import os


def _interp_default(flag: bool) -> bool:
    # "0"/"false"/"" mean OFF — bool(non-empty str) would force interpret
    # mode (orders of magnitude slower) on CSDR_PALLAS_INTERPRET=0
    env = os.environ.get("CSDR_PALLAS_INTERPRET", "").strip().lower()
    return flag or env not in ("", "0", "false", "no", "off")

from fractions import Fraction

from ..core.block import Block
from ..ops.pallas.pfb_fused import (
    channelized_fm_pallas_init,
    channelized_fm_pallas_step,
)

__all__ = ["PallasChannelizedFM", "FlagshipFused"]


class FlagshipFused(Block):
    """dcBlocker >> PFB >> PerChannel(FMDemod) as ONE Pallas kernel pass.

    ``layout`` selects the panel layout: "narrow" = (tileF, nch) panels
    (ops/pallas/flagship_fused.py), "wide" = 128-lane packed panels with
    R=128/nch frames per row (ops/pallas/flagship_fused_wide.py — no HBM
    lane padding, full-width MXU); "auto" picks wide when nch divides 64."""

    def __init__(self, nch: int, kf: float = 0.6, m: int = 7, as_db: float = 80.0,
                 tileF: int | None = None, dc_alpha: float = 0.0005,
                 interpret: bool = False, layout: str = "auto"):
        from fractions import Fraction
        from ..utils import autotune

        interpret = _interp_default(interpret)
        if layout == "auto":
            # wide requires nch | 64 and an on-chip autotune entry proving it
            # ran on this platform (fresh checkouts without a cache stay on
            # the long-soaked narrow kernel); when BOTH layouts have measured
            # entries — `bench.py tune` sweeps them in one window — pick the
            # faster, not a fixed preference
            wide_m = autotune.best_msps("flagship_fused_wide", nch) \
                if 64 % nch == 0 else None
            if wide_m is not None:
                narrow_m = autotune.best_msps("flagship_fused", nch)
                layout = "narrow" if (narrow_m is not None
                                      and narrow_m > wide_m) else "wide"
            else:
                layout = "narrow"
        if layout == "wide":
            from ..ops.pallas.flagship_fused_wide import (
                flagship_fused_wide_init as k_init,
                flagship_fused_wide_step as k_step)
            kernel_name = "flagship_fused_wide"
        elif layout == "narrow":
            from ..ops.pallas.flagship_fused import (
                flagship_fused_init as k_init, flagship_fused_step as k_step)
            kernel_name = "flagship_fused"
        else:
            raise ValueError(f"layout must be auto|narrow|wide, got {layout!r}")
        self.layout = layout
        if tileF is None:  # best-known tile from the autotune cache
            tileF = autotune.lookup(kernel_name, nch)

        self._init = lambda: k_init(nch, m)
        self._step = lambda st, x: k_step(
            st, x, nch=nch, m=m, as_db=as_db, kf=kf, tileF=tileF,
            dc_alpha=dc_alpha, interpret=interpret)
        self.rate = Fraction(1, nch)
        self.granule = nch * tileF
        # /v2: round 4's NCO fold changed what the WIDE kernel's hist state
        # carries (pre-rotation rows instead of post-NCO rows) — the
        # checkpoint signature must refuse a pre-fold checkpoint rather
        # than silently resume with a rotated-basis history (the structural
        # leaf check cannot tell them apart)
        ver = "/v2" if layout == "wide" else ""
        self.name = f"flagship_fused({nch}){ver}"

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
