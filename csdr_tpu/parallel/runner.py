"""Streaming runner for sharded multi-chip graphs — the multi-device
counterpart of core/runtime.Pipeline (host feed → sharded step → sinks).

Drives either the hand-fused flagship (parallel/channelized.
ShardedChannelizedFM) or any generic graph (parallel/generic.ShardedChain):
both expose ``init()``, ``step(state, x)``, ``block_size`` and an input
sharding; outputs are decoded host-side and trimmed to the exact
rational-rate sample count (the reference's byte-accounting invariant,
/root/reference/README.md:191-192)."""

from __future__ import annotations

from fractions import Fraction
from typing import Callable, Iterable, Iterator

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.runtime import (CEnc, rechunk, take_n, append_flush,
                            decode_tree_host, _trim_tree)

__all__ = ["ShardedPipeline"]


class ShardedPipeline:
    """Feed/drain loop around a sharded step.

    Input blocks are device_put with the time-sharded layout; outputs are
    gathered host-side for the sinks."""

    def __init__(self, sharded):
        self.sh = sharded
        self.state = sharded.init()
        self.block_size = sharded.block_size
        self.rate = self._rate(sharded)
        # per-leaf rational rates (multi-rate Tee graphs): the generic
        # ShardedChain exposes the underlying Block's rate_tree; the
        # hand-fused flagship has one scalar rate
        blk = getattr(sharded, "block", None)
        self.rate_tree = blk.rate_tree() if blk is not None else self.rate

    @staticmethod
    def _rate(sh) -> Fraction:
        r = getattr(sh, "rate", None)
        if r is not None:
            return Fraction(r)
        # ShardedChannelizedFM: nch channels at 1/(nch·audio_decim) each
        return Fraction(1, sh.nch * sh.audio_decim)

    def _put(self, chunk: np.ndarray):
        """Encode host-side, then shard the float planes over 'time'."""
        mesh = self.sh.mesh
        taxis = getattr(self.sh, "time_axis", "time")
        if np.iscomplexobj(chunk):
            f = np.stack([chunk.real, chunk.imag], axis=-1).astype(np.float32)
            return CEnc(jax.device_put(f, NamedSharding(mesh, P(taxis, None))))
        return jax.device_put(np.asarray(chunk), NamedSharding(mesh, P(taxis)))

    def reset(self):
        self.state = self.sh.init()

    def stream(self, source: Iterable[np.ndarray],
               num_samples: int | None = None,
               flush: bool = False) -> Iterator:
        """Yield decoded, trimmed output pytrees per block."""
        n = self.block_size
        it: Iterable[np.ndarray] = source
        if num_samples is not None:
            it = take_n(it, num_samples)
        if flush:
            blk = getattr(self.sh, "block", None)
            nflush = blk.flush_len() if blk is not None else 0
            if nflush:
                it = append_flush(it, nflush)
        rt = self.rate_tree
        for chunk in rechunk(it, n):
            valid = len(chunk)
            if valid < n:
                chunk = np.pad(chunk, (0, n - valid))
            self.state, y = self.sh.step(self.state, self._put(chunk))
            # tree-aware trim: tuple outputs (Tee graphs) trim per leaf,
            # each by its own rational rate — same rule as the serial
            # Pipeline (core/runtime._trim_tree)
            out, _ = _trim_tree(decode_tree_host(y), rt, valid)
            yield out

    def run(self, source: Iterable[np.ndarray], sink: Callable,
            num_samples: int | None = None, flush: bool = True) -> int:
        """Same end-of-stream flush semantics as the serial Pipeline.run
        (core/runtime): the graph's zero-fill allowance rides the ordinary
        sharded step, so mesh and serial outputs stay byte-identical."""
        total = 0
        for out in self.stream(source, num_samples, flush=flush):
            sink(out)
            first = jax.tree.leaves(out)[0]
            total += first.shape[-1] if first.ndim >= 2 else first.shape[0]
        return total
