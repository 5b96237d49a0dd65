"""WEFAX radiofax receiver (models/wefax.py): decode(modulate()) inverse."""

from __future__ import annotations

import numpy as np
import pytest

from csdr_tpu.models import wefax

FS = 12000.0


def _chart(lines=6, seed=0):
    """Smooth chart-like content (isobars = slow sinusoids) — the audio
    channel band-limits pixel-rate detail as on the real link."""
    rng = np.random.default_rng(seed)
    t = np.arange(wefax.PX_PER_LINE)
    img = np.zeros((lines, wefax.PX_PER_LINE), np.float64)
    for ln in range(lines):
        img[ln] = 200 - 150 * (0.5 + 0.5 * np.sin(
            2 * np.pi * (ln + 2) * t / wefax.PX_PER_LINE
            + rng.uniform(0, np.pi)))
    return np.asarray(np.rint(img), np.uint8)


def test_rejects_bad_rate_and_shape():
    with pytest.raises(ValueError):
        wefax.wefax_receiver(8000.0)
    with pytest.raises(ValueError):
        wefax.wefax_modulate(np.zeros((2, 100), np.uint8), FS)


def test_phasing_alignment_found():
    img = _chart(2)
    audio = wefax.wefax_modulate(img, FS)
    _, info = wefax.decode_audio(audio, FS)
    assert info["phasing_score"] > 0.9
    # the modulator starts at the pulse, so the raster phase is ~0 modulo
    # the filter group delay
    assert info["line_start"] < int(0.02 * FS) or \
        info["line_start"] > int(60.0 / 120.0 * FS) - int(0.02 * FS)


def test_wefax_end_to_end_inverse():
    img = _chart(6)
    audio = wefax.wefax_modulate(img, FS)
    got, info = wefax.decode_audio(audio, FS)
    assert info["lines"] >= len(img) - 1
    n = min(len(got), len(img))
    err = np.abs(got[:n].astype(float) - img[:n].astype(float))
    assert float(np.median(err)) <= 4.0, float(np.median(err))
    assert float(np.quantile(err, 0.95)) <= 16.0, float(np.quantile(err, 0.95))


def test_noise_rejected_by_phasing_score():
    rng = np.random.default_rng(3)
    noise = rng.normal(size=int(8 * FS)).astype(np.float32)
    img, info = wefax.decode_audio(noise, FS)
    assert info["lines"] == 0 and img.shape[0] == 0


def test_other_line_rates():
    """90 lpm decodes with the lpm parameter (charts publish their rate)."""
    img = _chart(3, seed=5)
    audio = wefax.wefax_modulate(img, FS, lpm=90.0)
    got, info = wefax.decode_audio(audio, FS, lpm=90.0)
    assert info["lines"] >= 2
    err = np.abs(got[:2].astype(float) - img[:2].astype(float))
    assert float(np.median(err)) <= 4.0


@pytest.mark.parametrize("dt", [2, 8])
def test_wefax_chain_shards(dt):
    import jax
    from jax.sharding import Mesh
    from csdr_tpu.core.runtime import Pipeline, decode_tree_host
    from csdr_tpu.parallel.generic import ShardedChain

    if dt > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = Mesh(np.asarray(jax.devices()[:dt]).reshape(dt, 1), ("time", "ch"))
    audio = wefax.wefax_modulate(_chart(2, seed=7), FS, phasing_lines=2)
    g = wefax.wefax_receiver(FS)
    n = (len(audio) // (2 * dt)) * dt
    ref_pipe = Pipeline(g, n, donate=False)
    sc = ShardedChain(wefax.wefax_receiver(FS), mesh, n)
    st = sc.init()
    for i in range(2):
        blk = np.asarray(audio[i * n:(i + 1) * n], np.float32)
        ref = np.asarray(decode_tree_host(ref_pipe.process_block(blk)))
        st, y = sc.step(st, blk)
        got = np.asarray(decode_tree_host(y))
        d = np.abs(got - ref) % FS
        d = np.minimum(d, FS - d)
        if i == 0:
            d = d[180:]      # FIR warmup (see test_sstv for the rationale)
        np.testing.assert_array_less(d, 0.5)


def test_wefax_decode_cli(tmp_path, monkeypatch, capsys):
    from csdr_tpu.apps.wefax_decode import main as wefax_main

    monkeypatch.chdir(tmp_path)
    img = _chart(4, seed=9)
    wefax.wefax_modulate(img, FS).tofile("fax.f32")
    rc = wefax_main(["fax.f32", "-s", str(FS), "-o", "chart.pgm"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "line(s)" in out and "chart.pgm" in out
    raw = open("chart.pgm", "rb").read()
    assert raw.startswith(b"P5\n1810 ")
    assert wefax_main(["fax.f32", "-s", "8000"]) == 1  # bad rate
