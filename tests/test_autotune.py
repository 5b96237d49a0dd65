"""utils.autotune: on-disk tile cache — lookup/record/sweep semantics."""

import json
import os

import pytest

from csdr_tpu.utils import autotune


@pytest.fixture
def cache(tmp_path, monkeypatch):
    p = str(tmp_path / "autotune.json")
    monkeypatch.setenv("CSDR_AUTOTUNE_CACHE", p)
    return p


def test_lookup_falls_back_to_defaults(cache):
    assert autotune.lookup("flagship_fused", 64) == autotune.DEFAULTS["flagship_fused"]
    assert (autotune.lookup("flagship_fused", 64, variant="u8")
            == autotune.DEFAULTS["flagship_fused:u8"])
    assert autotune.lookup("no_such_kernel", 64, default=7) == 7
    with pytest.raises(KeyError):
        autotune.lookup("no_such_kernel", 64)


def test_record_then_lookup_roundtrip(cache):
    autotune.record("flagship_fused", 64, 2048, 123.4, platform="testplat")
    assert autotune.lookup("flagship_fused", 64, platform="testplat") == 2048
    # other nch / platform unaffected → default
    assert (autotune.lookup("flagship_fused", 128, platform="testplat")
            == autotune.DEFAULTS["flagship_fused"])
    # file is valid JSON with the documented key shape
    d = json.load(open(cache))
    assert d["flagship_fused:testplat:64"]["msps"] == pytest.approx(123.4)


def test_sweep_picks_winner_and_records_infeasible(cache):
    def bench(t):
        if t == 1024:
            raise MemoryError("VMEM OOM")
        return {128: 10.0, 256: 30.0, 512: 20.0}[t]

    best, results = autotune.sweep("pfb_fused", 64, (128, 256, 512, 1024),
                                   bench, platform="testplat")
    assert best == 256
    assert autotune.lookup("pfb_fused", 64, platform="testplat") == 256
    by_t = {r["tileF"]: r for r in results}
    assert "error" in by_t[1024] and "MemoryError" in by_t[1024]["error"]
    # full sweep is persisted for later inspection
    d = json.load(open(cache))
    assert len(d["pfb_fused:testplat:64"]["sweep"]) == 4


def test_sweep_all_infeasible_raises(cache):
    def bad(t):
        raise RuntimeError("nope")
    with pytest.raises(RuntimeError, match="no feasible"):
        autotune.sweep("pfb_fused", 64, (128, 256), bad, platform="testplat")


def test_packaged_cache_ships_tpu_sweeps(cache):
    # the committed package cache carries the real-chip sweep results and is
    # consulted for keys the user cache lacks (exact winners change when the
    # cache is re-swept on chip — assert shape, not values)
    tiles = (128, 256, 512, 1024, 2048, 4096)
    assert autotune.has_entry("flagship_fused_wide", 64, platform="tpu")
    assert autotune.lookup("flagship_fused_wide", 64, platform="tpu") in tiles
    assert autotune.lookup("flagship_fused", 64, variant="u8",
                           platform="tpu") in tiles
    assert autotune.best_msps("flagship_fused_wide", 64, platform="tpu") > 0
    # ... but not invented for other platforms
    assert not autotune.has_entry("flagship_fused_wide", 64, platform="cpu")


def test_user_cache_overrides_packaged(cache):
    autotune.record("flagship_fused_wide", 64, 999, 1.0, platform="tpu")
    assert autotune.lookup("flagship_fused_wide", 64, platform="tpu") == 999
    # packaged entries for other keys still visible
    assert autotune.has_entry("pfb_fused", 64, platform="tpu")


def test_layout_auto_picks_faster_cached_variant(cache):
    # FlagshipFused(layout="auto"): no wide entry on this platform -> narrow
    from csdr_tpu.blocks.pallas_blocks import FlagshipFused

    assert FlagshipFused(64).layout == "narrow"
    # wide entry only -> wide
    autotune.record("flagship_fused_wide", 64, 128, 50000.0)
    assert FlagshipFused(64).layout == "wide"
    # both measured, narrow faster -> narrow (auto compares msps, it does
    # not hard-prefer wide)
    autotune.record("flagship_fused", 64, 256, 60000.0)
    assert FlagshipFused(64).layout == "narrow"
    # both measured, wide faster -> wide
    autotune.record("flagship_fused_wide", 64, 128, 70000.0)
    assert FlagshipFused(64).layout == "wide"
    # nch that wide cannot serve stays narrow regardless of cache
    autotune.record("flagship_fused_wide", 48, 128, 70000.0)
    assert FlagshipFused(48).layout == "narrow"


def test_corrupt_cache_is_ignored(cache):
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "w") as f:
        f.write("{not json")
    assert autotune.lookup("flagship_fused", 64) == autotune.DEFAULTS["flagship_fused"]
