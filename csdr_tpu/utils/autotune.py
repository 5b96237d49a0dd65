"""On-disk autotune cache for Pallas kernel tile sizes.

The fused kernels' one free scheduling knob is ``tileF`` — frames per grid
tile.  The best value depends on the kernel variant (how many VMEM
temporaries the kernel keeps live), ``nch``, the input dtype (u8 planes DMA
slower per frame than f32), and the platform.  Rather than hard-coding one
number per call site, call sites default to ``lookup(...)`` which consults a
small JSON cache; ``python bench.py tune`` (on the real chip) or any direct
``sweep(...)`` call fills it.

The cache lives at ``$CSDR_AUTOTUNE_CACHE`` or
``$XDG_CACHE_HOME/csdr_tpu/autotune.json`` (``~/.cache/...``).  Entries are
keyed ``kernel:platform:nch[:variant]`` and record the winning tile plus the
full sweep so a later reader can see the margins.

The reference has no analogue (liquid-dsp's kernels are scalar loops); this
plays the role that per-shape plan caches play in FFTW/cuFFT-style libraries.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable

__all__ = ["lookup", "record", "sweep", "cache_path", "DEFAULTS"]

_CACHE_ENV = "CSDR_AUTOTUNE_CACHE"

# Static fallbacks when no cache entry exists (measured on the real chip;
# see STATUS.md / docs/PERF.md).  The wide-kernel pins follow the round-4
# re-pin under the split2+nco_fold schedule: 2048 → 4096 measured +9.1% u8
# / +8.3% f32 (KERNEL_TILEF_r04 / KERNEL_TILEF_F32_r04, scan-paired); a
# stale 512 fallback would cost >50% whenever the cache file is absent.
DEFAULTS = {
    "flagship_fused": 256,
    "flagship_fused:u8": 512,   # 1024 exceeds 16 MB VMEM with bf16_3x temps
    "flagship_fused_wide": 4096,
    "flagship_fused_wide:u8": 4096,
    "pfb_fused": 1024,
    "pfb_chan_only": 1024,
    "fftfir": 0,  # fftfir has no tileF; placeholder key for future knobs
}


def cache_path() -> str:
    p = os.environ.get(_CACHE_ENV)
    if p:
        return p
    root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(root, "csdr_tpu", "autotune.json")


def _platform() -> str:
    try:
        import jax
        return jax.default_backend()
    except Exception:  # pragma: no cover - jax import is assumed elsewhere
        return "unknown"


# Measured sweeps shipped with the package (benchmarks on the real chip
# write here via CSDR_AUTOTUNE_CACHE and the result is committed) — the
# user cache overrides per key.
_PACKAGED = os.path.join(os.path.dirname(__file__), "autotune_tpu.json")


def _load() -> dict:
    d = {}
    for path in (_PACKAGED, cache_path()):
        try:
            with open(path) as f:
                d.update(json.load(f))
        except (OSError, ValueError):
            pass
    return d


def _store(d: dict) -> None:
    path = cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _key(kernel: str, nch: int, variant: str | None, platform: str | None) -> str:
    plat = platform or _platform()
    k = f"{kernel}:{plat}:{nch}"
    return f"{k}:{variant}" if variant else k


def has_entry(kernel: str, nch: int, variant: str | None = None,
              platform: str | None = None) -> bool:
    """True iff the on-disk cache has a measured entry for this key (used to
    gate opt-in kernel variants on proof that they ran on this platform)."""
    return _key(kernel, nch, variant, platform) in _load()


def best_msps(kernel: str, nch: int, variant: str | None = None,
              platform: str | None = None) -> float | None:
    """Measured throughput of the cached winner for this key, or None.  Used
    to choose BETWEEN kernel variants (e.g. flagship narrow vs wide layout):
    `bench.py tune` sweeps all variants in one window, so their cached msps
    are same-window comparable."""
    ent = _load().get(_key(kernel, nch, variant, platform))
    return float(ent["msps"]) if ent and "msps" in ent else None


def lookup(kernel: str, nch: int, default: int | None = None,
           variant: str | None = None, platform: str | None = None) -> int:
    """Best-known tileF for (kernel, nch, variant) on this platform.

    Falls back to DEFAULTS[kernel[:variant]] then ``default``."""
    ent = _load().get(_key(kernel, nch, variant, platform))
    if ent and "tileF" in ent:
        return int(ent["tileF"])
    dk = f"{kernel}:{variant}" if variant else kernel
    if dk in DEFAULTS:
        return DEFAULTS[dk]
    if default is not None:
        return default
    raise KeyError(f"no autotune entry or default for {dk}")


def record(kernel: str, nch: int, tileF: int, msps: float,
           variant: str | None = None, platform: str | None = None,
           sweep_results: list | None = None) -> None:
    d = _load()
    d[_key(kernel, nch, variant, platform)] = {
        "tileF": int(tileF),
        "msps": float(msps),
        "ts": time.time(),
        **({"sweep": sweep_results} if sweep_results else {}),
    }
    _store(d)


def sweep(kernel: str, nch: int, candidates: Iterable[int],
          bench_fn: Callable[[int], float], variant: str | None = None,
          platform: str | None = None, verbose: bool = False):
    """Time ``bench_fn(tileF)`` for each candidate, record the winner.

    Candidates that raise (VMEM OOM, Mosaic rejection, ...) are recorded as
    infeasible and skipped.  Returns ``(best_tileF, results)`` where results
    is ``[{"tileF": t, "msps": x | None, "error": str | None}, ...]``."""
    results = []
    best_t, best_m = None, -1.0
    for t in candidates:
        try:
            m = float(bench_fn(t))
            results.append({"tileF": t, "msps": m})
            if verbose:
                print(f"#   tileF={t}: {m:.1f} MSPS", flush=True)
            if m > best_m:
                best_t, best_m = t, m
        except Exception as e:  # infeasible tile (OOM etc.) — keep sweeping
            results.append({"tileF": t, "error": f"{type(e).__name__}: {e}"[:200]})
            if verbose:
                print(f"#   tileF={t}: infeasible ({type(e).__name__})", flush=True)
    if best_t is None:
        raise RuntimeError(f"autotune sweep for {kernel}: no feasible candidate")
    record(kernel, nch, best_t, best_m, variant=variant, platform=platform,
           sweep_results=results)
    return best_t, results
