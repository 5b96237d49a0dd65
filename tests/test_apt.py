"""NOAA APT receiver (models/apt.py): decode(modulate(image)) inverse pair."""

from __future__ import annotations

import numpy as np
import pytest

from csdr_tpu.models import apt

FS = 8 * apt.WORD_RATE  # 33.28 kHz, 2m x word rate (m=4)


def _test_image(lines=8, seed=0):
    """Full 2080-word rows with real APT structure: sync trains at spec
    levels, black spaces, smooth video content (the 2400 Hz product
    detector band-limits single-word detail by design, as on the real
    link), constant telemetry wedges."""
    rng = np.random.default_rng(seed)
    rows = np.zeros((lines, apt.LINE_WORDS), np.float64)
    t = np.arange(909)
    for ln in range(lines):
        row = rows[ln]
        row[:39] = apt.SYNC_A * (244 - 11) + 11
        row[39:86] = 11                                   # space A
        row[86:995] = 128 + 110 * np.sin(
            2 * np.pi * (ln + 1) * t / 909 + rng.uniform(0, np.pi))
        row[995:1040] = 40 * (ln % 2) + 60                # telemetry A
        row[1040:1079] = np.concatenate(
            [apt.SYNC_B, np.zeros(39 - len(apt.SYNC_B))]) * (244 - 11) + 11
        row[1079:1126] = 11                               # space B
        row[1126:2035] = 128 + 90 * np.cos(2 * np.pi * 3 * t / 909)
        row[2035:] = 200                                  # telemetry B
    return np.asarray(np.rint(rows), np.uint8)


def test_receiver_rejects_bad_rate():
    with pytest.raises(ValueError):
        apt.apt_receiver(11025.0)  # not 2m x 4160


def test_sync_template_shapes():
    assert len(apt.SYNC_A) == 39
    assert apt.SYNC_A.sum() == 14           # 7 cycles x 2 high words
    assert len(apt.SYNC_B) == 39
    assert apt.SYNC_B.sum() == 21           # 7 pulses x 3 high words


def test_apt_end_to_end_inverse():
    img = _test_image()
    audio = apt.apt_modulate(img, FS)
    got, info = apt.decode_audio(audio, FS)
    # filter group delay eats the partial first/last lines; interior lines
    # must all be found at exactly one-line spacing
    assert info["lines"] >= len(img) - 2
    s = np.asarray(info["syncs"])
    assert np.all(np.diff(s) == apt.LINE_WORDS)

    # match decoded rows to source rows by sync phase
    phase = int(s[0]) % apt.LINE_WORDS
    first_line = int(s[0]) // apt.LINE_WORDS + (1 if phase > 39 else 0)
    va_got, vb_got = apt.split_channels(got)
    va_want, _ = apt.split_channels(img)
    n = min(len(va_got), len(img) - first_line)
    assert n >= 4
    err = np.abs(va_got[:n].astype(float)
                 - va_want[first_line:first_line + n].astype(float))
    # product detection + decimation phase blur smooth content only a little
    assert float(np.median(err)) <= 3.0, float(np.median(err))
    assert float(np.quantile(err, 0.95)) <= 12.0, float(np.quantile(err, 0.95))

    # absolute calibration came from the sync train: spec black/white
    lo, hi = info["level_lo"], info["level_hi"]
    assert hi > lo > 0.0


def test_decode_words_empty_and_short():
    img0, info0 = apt.decode_words(np.zeros(10))
    assert img0.shape == (0, apt.LINE_WORDS) and info0["lines"] == 0
    img1, _ = apt.decode_words(np.random.default_rng(1).uniform(0, 1, 500))
    assert img1.shape[0] == 0  # no sync, no lines


def test_pure_noise_fabricates_no_lines():
    """Round-5 review regression: a relative correlation threshold decoded
    3 'lines' from pure noise — the absolute NCC floor + the line-spacing
    structural gate must reject signal-free input of ANY length."""
    rng = np.random.default_rng(8)
    for n_lines in (1, 3, 8):
        img, info = apt.decode_words(rng.uniform(0, 1, n_lines * apt.LINE_WORDS))
        assert info["lines"] == 0, (n_lines, info)


def test_modulate_validates_shape():
    with pytest.raises(ValueError):
        apt.apt_modulate(np.zeros((2, 100), np.uint8), FS)


def test_apt_decode_cli(tmp_path, monkeypatch, capsys):
    from csdr_tpu.apps.apt_decode import main as apt_main

    monkeypatch.chdir(tmp_path)
    img = _test_image(lines=6, seed=2)
    apt.apt_modulate(img, FS).tofile("apt.f32")
    rc = apt_main(["apt.f32", "-s", str(FS), "-o", "wx.pgm", "--channel", "a"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "line(s)" in out and "wx.pgm" in out
    raw = open("wx.pgm", "rb").read()
    assert raw.startswith(b"P5\n909 ")
    w, h = (int(v) for v in raw.split(b"\n")[1].split())
    assert w == 909 and h >= 4
    payload = raw.split(b"\n", 3)[3]
    assert len(payload) == w * h
    # wrong rate: clean error
    assert apt_main(["apt.f32", "-s", "44100"]) == 1


@pytest.mark.parametrize("dt", [2, 8])
def test_apt_chain_shards(dt):
    """The APT receiver chain (NCO mix + FIR + per-shard coherent detection
    + decimator) sharded over time matches the serial Pipeline: the carrier
    phase estimate is per-shard but the underlying phase is one global
    constant, so shards agree to float precision."""
    import jax
    from jax.sharding import Mesh
    from csdr_tpu.core.runtime import Pipeline, decode_tree_host
    from csdr_tpu.parallel.generic import ShardedChain

    if dt > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = Mesh(np.asarray(jax.devices()[:dt]).reshape(dt, 1), ("time", "ch"))
    img = _test_image(lines=4, seed=4)
    audio = apt.apt_modulate(img, FS)
    g = apt.apt_receiver(FS)
    n = (len(audio) // (2 * g.granule * dt)) * (g.granule * dt)
    ref_pipe = Pipeline(g, n, donate=False)
    sc = ShardedChain(apt.apt_receiver(FS), mesh, n)
    st = sc.init()
    for i in range(2):
        blk = np.asarray(audio[i * n:(i + 1) * n], np.float32)
        ref = np.asarray(decode_tree_host(ref_pipe.process_block(blk)))
        st, y = sc.step(st, blk)
        got = np.asarray(decode_tree_host(y))
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-3)
