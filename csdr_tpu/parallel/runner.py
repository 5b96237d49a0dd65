"""Streaming runner for the sharded multi-chip receiver — the multi-device
counterpart of core/runtime.Pipeline (host feed → sharded step → sinks)."""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import jax

from ..core.runtime import rechunk, take_n, decode_tree_host
from .channelized import ShardedChannelizedFM

__all__ = ["ShardedPipeline"]


class ShardedPipeline:
    """Feed/drain loop around ShardedChannelizedFM.step.

    Input blocks are device_put with the time-sharded layout; outputs arrive
    channel-sharded and are gathered host-side for the sinks.
    """

    def __init__(self, sharded: ShardedChannelizedFM):
        self.sh = sharded
        self.state = sharded.init()
        self.block_size = sharded.block_size

    def run(self, source: Iterable[np.ndarray], sink: Callable[[np.ndarray], None],
            num_samples: int | None = None) -> int:
        n = self.block_size
        it: Iterable[np.ndarray] = source
        if num_samples is not None:
            it = take_n(it, num_samples)
        rate_den = self.sh.nch * self.sh.audio_decim
        total = 0
        for chunk in rechunk(it, n):
            valid = len(chunk)
            if valid < n:
                chunk = np.pad(chunk, (0, n - valid))
            # encode host-side then shard the float planes over 'time'
            f = np.stack([chunk.real, chunk.imag], axis=-1).astype(np.float32)
            from ..core.runtime import CEnc
            from jax.sharding import NamedSharding, PartitionSpec as P

            xe = CEnc(jax.device_put(
                f, NamedSharding(self.sh.mesh, P("time", None))))
            self.state, y = self.sh.step(self.state, xe)
            valid_out = valid // rate_den
            arr = decode_tree_host(y)
            sink(arr[..., :valid_out])
            total += valid_out
        return total
