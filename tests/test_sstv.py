"""SSTV receiver (models/sstv.py): decode(modulate(image)) inverse pair."""

from __future__ import annotations

import numpy as np
import pytest

from csdr_tpu.models import sstv

FS = 11025.0


def _test_image(lines=8, px=320, seed=0):
    """Smooth RGB content (the discriminator band-limits pixel-rate detail
    exactly as the real audio channel does)."""
    rng = np.random.default_rng(seed)
    t = np.arange(px)
    img = np.zeros((lines, px, 3), np.float64)
    for ln in range(lines):
        img[ln, :, 0] = 128 + 100 * np.sin(2 * np.pi * t / px + ln * 0.3)
        img[ln, :, 1] = np.clip(255 * t / px, 0, 255)
        img[ln, :, 2] = 40 + 20 * (ln % 4) + 30 * np.cos(
            4 * np.pi * t / px + rng.uniform(0, 1))
    return np.asarray(np.rint(img), np.uint8)


def test_rejects_bad_shapes_and_rates():
    with pytest.raises(ValueError):
        sstv.sstv_receiver(4000.0)
    with pytest.raises(ValueError):
        sstv.sstv_modulate(np.zeros((4, 100, 3), np.uint8), FS)


def test_vis_header_roundtrip():
    img = _test_image(lines=2)
    audio = sstv.sstv_modulate(img, FS, mode="martin1")
    _, info = sstv.decode_audio(audio, FS)
    assert info["mode"] == "martin1" and info["vis_detected"]
    audio2 = sstv.sstv_modulate(img, FS, mode="martin2")
    _, info2 = sstv.decode_audio(audio2, FS)
    assert info2["mode"] == "martin2"


def test_sstv_end_to_end_inverse():
    img = _test_image(lines=6)
    audio = sstv.sstv_modulate(img, FS, mode="martin1")
    got, info = sstv.decode_audio(audio, FS)
    assert info["mode"] == "martin1"
    assert info["lines"] >= len(img) - 1
    n = min(len(got), len(img))
    err = np.abs(got[:n].astype(float) - img[:n].astype(float))
    assert float(np.median(err)) <= 4.0, float(np.median(err))
    assert float(np.quantile(err, 0.95)) <= 16.0, float(np.quantile(err, 0.95))


def test_forced_mode_without_vis():
    """A recording that starts mid-transmission (no VIS) still decodes with
    an explicit mode."""
    img = _test_image(lines=4, seed=2)
    audio = sstv.sstv_modulate(img, FS, mode="martin1")
    # chop off the header (610 ms + 10 bits x 30 ms)
    cut = int(1.0 * FS)
    got, info = sstv.decode_audio(np.asarray(audio)[cut:], FS,
                                  mode="martin1")
    assert info["mode"] == "martin1" and not info["vis_detected"]
    assert info["lines"] >= 2


@pytest.mark.parametrize("dt", [2, 8])
def test_sstv_chain_shards(dt):
    """The discriminator chain sharded over time matches the serial
    Pipeline (NCO mix offsets + FIR halo + 1-sample FM-demod halo)."""
    import jax
    from jax.sharding import Mesh
    from csdr_tpu.core.runtime import Pipeline, decode_tree_host
    from csdr_tpu.parallel.generic import ShardedChain

    if dt > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = Mesh(np.asarray(jax.devices()[:dt]).reshape(dt, 1), ("time", "ch"))
    img = _test_image(lines=2, seed=3)
    audio = sstv.sstv_modulate(img, FS, mode="martin2")
    g = sstv.sstv_receiver(FS)
    n = (len(audio) // (2 * dt)) * dt
    ref_pipe = Pipeline(g, n, donate=False)
    sc = ShardedChain(sstv.sstv_receiver(FS), mesh, n)
    st = sc.init()
    for i in range(2):
        blk = np.asarray(audio[i * n:(i + 1) * n], np.float32)
        ref = np.asarray(decode_tree_host(ref_pipe.process_block(blk)))
        st, y = sc.step(st, blk)
        got = np.asarray(decode_tree_host(y))
        # wrap-aware: at sharp frequency steps the phase-difference demod's
        # angle is ambiguous modulo 2π (= fs in Hz) and serial/sharded can
        # legitimately resolve a transient edge one wrap apart
        d = np.abs(got - ref) % FS
        d = np.minimum(d, FS - d)
        if i == 0:
            # stream-start warmup: the 161-tap FIR ramps from zero history
            # and angle() of near-zero complex values is ill-conditioned —
            # those samples precede any signal and carry no information
            d = d[180:]
        np.testing.assert_array_less(d, 0.5)  # Hz


def test_sstv_decode_cli(tmp_path, monkeypatch, capsys):
    from csdr_tpu.apps.sstv_decode import main as sstv_main

    monkeypatch.chdir(tmp_path)
    img = _test_image(lines=3, seed=5)
    sstv.sstv_modulate(img, FS, mode="martin1").tofile("tx.f32")
    rc = sstv_main(["tx.f32", "-s", str(FS), "-o", "rx.ppm"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "martin1" in out and "(VIS)" in out
    raw = open("rx.ppm", "rb").read()
    assert raw.startswith(b"P6\n320 ")
    w, h = (int(v) for v in raw.split(b"\n")[1].split())
    payload = raw.split(b"\n", 3)[3]
    assert len(payload) == w * h * 3
    # bad rate: clean error
    assert sstv_main(["tx.f32", "-s", "4000"]) == 1
