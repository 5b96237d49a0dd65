"""The Block protocol — TPU-native replacement for the reference's `Pipe`.

Reference design: `Pipe m a b = {start :: m r, process :: r -> a -> m b,
done :: r -> m ()}` composed via a Category instance
(/root/reference/src/ComposableSDR/Types.hs:51-103) — opaque C state mutated
per chunk.

TPU design: a Block is static config + two pure functions over explicit state
pytrees:

    init()            -> state            (a pytree of jnp arrays)
    apply(state, x)   -> (state, y)       (pure; jit/scan/vmap/shard_map-able)

Composition is function composition with a tuple-of-states carry; a whole
receiver graph is ONE jitted function.  Because state is an explicit pytree,
checkpoint/resume and multi-host state exchange are trivial (SURVEY.md §5).

Rate algebra: every block declares a rational `rate` (output samples per input
sample) and a `granule` (its input length must be a multiple of this).  A
chain computes the minimal input granule satisfying every stage, so all shapes
are static under jit.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["Block", "Chain", "chain", "Lambda", "Tee", "PerChannel", "MixChannels", "Delay"]


class Block:
    """Base class.  Subclasses define init/apply and may override rate/granule."""

    rate: Fraction = Fraction(1)
    granule: int = 1
    name: str = ""

    def init(self) -> Any:
        return ()

    def apply(self, state: Any, x: Any):
        raise NotImplementedError

    # ergonomic composition: a >> b means "a then b" (left-to-right, the
    # reverse of the reference's right-to-left `.`)
    def __rshift__(self, other: "Block") -> "Chain":
        return chain(self, other)

    def out_len(self, n_in: int) -> int:
        r = self.rate
        assert (n_in * r.numerator) % r.denominator == 0, (n_in, r)
        return n_in * r.numerator // r.denominator

    def __repr__(self):
        return f"<{type(self).__name__} {self.name} rate={self.rate} granule={self.granule}>"


def _chain_granule(blocks: Sequence[Block]) -> int:
    """Minimal input length quantum n such that every stage i receives a
    multiple of its granule: n · Π_{j<i} rate_j ≡ 0 (mod granule_i)."""
    need = 1
    acc = Fraction(1)
    for b in blocks:
        # n·acc must be integer AND divisible by b.granule
        # n·acc/g ∈ ℤ  ⇔  n·acc.num / (acc.den·g) ∈ ℤ
        den = acc.denominator * b.granule
        num = acc.numerator
        q = den // math.gcd(num, den)
        need = need * q // math.gcd(need, q)
        acc = acc * b.rate
    return need


class Chain(Block):
    def __init__(self, blocks: Sequence[Block], name: str = ""):
        flat: list[Block] = []
        for b in blocks:
            if isinstance(b, Chain):
                flat.extend(b.blocks)
            else:
                flat.append(b)
        self.blocks = tuple(flat)
        self.rate = math.prod((b.rate for b in self.blocks), start=Fraction(1))
        self.granule = _chain_granule(self.blocks)
        self.name = name or ">>".join(b.name or type(b).__name__ for b in self.blocks)

    def init(self):
        return tuple(b.init() for b in self.blocks)

    def apply(self, state, x):
        new_states = []
        for b, s in zip(self.blocks, state):
            s, x = b.apply(s, x)
            new_states.append(s)
        return tuple(new_states), x


def chain(*blocks: Block) -> Chain:
    return Chain(blocks)


class Lambda(Block):
    """Stateless elementwise/whole-block function (reference `mapA`,
    Trans.hs:146-147, minus the list round-trip)."""

    def __init__(self, fn: Callable, rate: Fraction = Fraction(1), granule: int = 1,
                 name: str = "lambda"):
        self.fn = fn
        self.rate = Fraction(rate)
        self.granule = granule
        self.name = name

    def apply(self, state, x):
        return state, self.fn(x)


class Tee(Block):
    """Run two blocks on the same input, produce a tuple (reference `tee`,
    Trans.hs:131-144 — without the Haskell-list zip)."""

    def __init__(self, b1: Block, b2: Block, name: str = "tee"):
        assert b1.rate == b2.rate, (b1.rate, b2.rate)
        self.b1, self.b2 = b1, b2
        self.rate = b1.rate
        self.granule = b1.granule * b2.granule // math.gcd(b1.granule, b2.granule)
        self.name = name

    def init(self):
        return (self.b1.init(), self.b2.init())

    def apply(self, state, x):
        s1, y1 = self.b1.apply(state[0], x)
        s2, y2 = self.b2.apply(state[1], x)
        return (s1, s2), (y1, y2)


class PerChannel(Block):
    """vmap a block over a leading channel axis: the TPU-native version of the
    reference's per-channel fan-out (`mux`/`distribute_`,
    Trans.hs:106-129) — channels are a tensor axis, not a Haskell list."""

    def __init__(self, inner: Block, nch: int, name: str = "per_channel"):
        self.inner = inner
        self.nch = nch
        self.rate = inner.rate
        self.granule = inner.granule
        self.name = f"{name}[{nch}x{inner.name or type(inner).__name__}]"

    def init(self):
        # stack nch copies of the inner state along a new leading axis
        states = [self.inner.init() for _ in range(self.nch)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def apply(self, state, x):
        return jax.vmap(self.inner.apply)(state, x)


class MixChannels(Block):
    """Sum over the channel axis (reference `mix`, Trans.hs:119-122 — there a
    per-element Haskell list fold; here a single reduction)."""

    def __init__(self, name: str = "mix"):
        self.name = name

    def apply(self, state, x):
        return state, jnp.sum(x, axis=0)


class Delay(Block):
    """Pair the stream with an n-sample delayed copy: output (x, delay(x)).

    Reference `delay` (Trans.hs:86-104) pairs each sample with the sample n
    positions *earlier* to compensate filter group delay in the stereo
    decoder.  State: last n samples of the previous block.

    End-of-stream note: the reference's fold-`done` emits the final n
    buffered samples paired with zeros; this streaming Block has no
    end-of-stream hook, so the delayed copy simply ends n samples early
    (n = a filter group delay, microseconds of audio).
    """

    def __init__(self, n: int, dtype=jnp.float32, name: str = "delay"):
        self.n = n
        self.dtype = dtype
        self.name = f"{name}({n})"

    def init(self):
        return jnp.zeros((self.n,), dtype=self.dtype)

    def apply(self, state, x):
        full = jnp.concatenate([state, x])
        delayed = full[: x.shape[0]]
        return full[x.shape[0]:], (x, delayed)
