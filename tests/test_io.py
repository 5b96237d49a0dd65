"""WAV/AU codecs, file sources/sinks, synthetic SDR source."""

import numpy as np

import csdr_tpu as cs
from csdr_tpu.io import wav as wavio


def test_wav_roundtrip_mono(tmp_path):
    p = str(tmp_path / "t.wav")
    x = np.random.default_rng(0).normal(size=1000).astype(np.float32) * 0.5
    wavio.write_wav(p, x, 48000)
    y, sr = wavio.read_wav(p)
    assert sr == 48000
    assert np.array_equal(x, y)


def test_wav_roundtrip_stereo(tmp_path):
    p = str(tmp_path / "t2.wav")
    x = np.random.default_rng(1).normal(size=(500, 2)).astype(np.float32) * 0.5
    wavio.write_wav(p, x, 24000)
    y, sr = wavio.read_wav(p)
    assert y.shape == (500, 2)
    assert np.array_equal(x, y)


def test_au_roundtrip(tmp_path):
    p = str(tmp_path / "t.au")
    x = np.random.default_rng(2).normal(size=256).astype(np.float32)
    wavio.write_au(p, x, 8000)
    y, sr = wavio.read_au(p)
    assert sr == 8000
    assert np.array_equal(x, y)


def test_cf32_source_sink_roundtrip(tmp_path):
    p = str(tmp_path / "x.cf32")
    x = (np.random.default_rng(3).normal(size=5000)
         + 1j * np.random.default_rng(4).normal(size=5000)).astype(np.complex64)
    with cs.RawFileSink(p) as sink:
        sink(x)
    got = np.concatenate(list(cs.cf32_file_source(p, chunk_size=777)))
    assert np.array_equal(got, x)


def test_wav_iq_source(tmp_path):
    from csdr_tpu.utils import testsig
    p = str(tmp_path / "audio.wav")
    x = testsig.tone(8192, 0.1, complex_out=False) * 0.5
    wavio.write_wav(p, x, 48000)
    iq = np.concatenate(list(cs.wav_iq_source(p, chunk_size=1024)))
    assert iq.shape[0] == 4096
    assert iq.dtype == np.complex64
    # tone at 0.1 of original rate → (0.2 of new rate, then mixed by π → 0.2-0.5 → -0.3)
    spec = np.abs(np.fft.fft(iq[512:4096 + 512 - 1024]))
    f = np.fft.fftfreq(len(spec))
    peak_f = f[np.argmax(spec)]
    assert abs(peak_f - (-0.3)) < 0.01, peak_f


def test_synthetic_sdr_source():
    devs = cs.enumerate_devices()
    assert {"driver": "synthetic"} in devs
    src = cs.open_sdr("synthetic", 2.56e6, 100e6, 0.0, total_samples=300_000)
    total = sum(len(c) for c in src)
    assert total == 300_000


def test_channel_file_sinks(tmp_path):
    nch = 4
    sink = cs.ChannelFileSinks(
        lambda i: cs.RawFileSink(str(tmp_path / f"out_ch{i + 1}.cf32")), nch)
    data = np.arange(nch * 100).reshape(nch, 100).astype(np.complex64)
    sink(data)
    sink.close()
    for i in range(nch):
        got = np.fromfile(str(tmp_path / f"out_ch{i + 1}.cf32"), dtype=np.complex64)
        assert np.array_equal(got, data[i])


def test_constellation_sink(tmp_path):
    p = str(tmp_path / "c.m")
    with cs.ConstellationPlotSink(p, max_points=10) as sink:
        sink(np.ones(20, np.complex64))
    text = open(p).read()
    assert text.count("v(end+1)") == 10
    assert "print -dpng" in text


def test_u8_to_iq_block():
    import jax.numpy as jnp
    blk = cs.u8_to_iq()
    u8 = np.array([0, 255, 127, 128, 255, 0], dtype=np.uint8)
    _, y = blk.apply((), jnp.asarray(u8))
    y = np.asarray(y)
    assert y.dtype == np.complex64
    assert np.allclose(y[0], (-1 + 1j), atol=0.01)
    assert np.allclose(y[2], (1 - 1j), atol=0.01)


def test_stdout_sink(capsysbinary):
    sink = cs.StdoutSink()
    sink(np.arange(4, dtype=np.float32))
    sink.close()
    out = capsysbinary.readouterr().out
    assert np.array_equal(np.frombuffer(out, dtype=np.float32), np.arange(4))


def test_skip_n_resume_seek():
    from csdr_tpu.core.runtime import skip_n

    chunks = [np.arange(0, 7), np.arange(7, 15), np.arange(15, 20)]
    got = np.concatenate(list(skip_n(iter(chunks), 9)))
    assert np.array_equal(got, np.arange(9, 20))
    # boundary-exact skip and skip-everything
    assert np.array_equal(np.concatenate(list(skip_n(iter(chunks), 7))),
                          np.arange(7, 20))
    assert list(skip_n(iter(chunks), 20)) == []


def test_probe_wav_header_only(tmp_path):
    from csdr_tpu.io.wav import probe_wav, write_wav

    p = str(tmp_path / "probe.wav")
    write_wav(p, np.zeros(1024, np.float32), 48000)
    sr, nch, tag = probe_wav(p)
    assert (sr, nch, tag) == (48000, 1, 3)
    bad = str(tmp_path / "bad.cf32")
    np.zeros(64, np.complex64).tofile(bad)
    import pytest

    with pytest.raises(ValueError):
        probe_wav(bad)


def test_raw_bytes_source(tmp_path):
    from csdr_tpu.io.sources import raw_bytes_source

    p = str(tmp_path / "raw.bin")
    payload = np.arange(1000, dtype=np.uint8)
    payload.tofile(p)
    chunks = list(raw_bytes_source(p, chunk_bytes=256))
    assert [len(c) for c in chunks] == [256, 256, 256, 232]
    assert np.array_equal(np.concatenate(chunks), payload)


def test_spectrum_plot_sink(tmp_path):
    """Welch PSD sink: tone at fs/8 peaks in the right bin, matches
    scipy.signal.welch, and the Octave script is complete."""
    from scipy import signal as sp_signal

    from csdr_tpu.io.sinks import SpectrumPlotSink

    fs, nfft, n = 1.0e6, 256, 256 * 40
    t = np.arange(n)
    x = np.exp(2j * np.pi * (fs / 8) / fs * t).astype(np.complex64)
    x += 0.001 * (np.random.default_rng(0).standard_normal(n)
                  + 1j * np.random.default_rng(1).standard_normal(n))

    p = tmp_path / "spec.m"
    snk = SpectrumPlotSink(str(p), nfft=nfft, sample_rate=fs)
    # feed in uneven chunks to exercise the carry tail
    for seg in np.split(x, [1000, 5000, 7777]):
        snk(seg)
    snk.close()

    txt = p.read_text()
    assert "plot(f, p" in txt and "print -dpng" in txt
    fvals = np.array([float(v) for v in
                      txt.split("f = [")[1].split("];")[0].split()])
    pvals = np.array([float(v) for v in
                      txt.split("p = [")[1].split("];")[0].split()])
    assert len(fvals) == nfft and len(pvals) == nfft
    # peak at fs/8
    assert abs(fvals[np.argmax(pvals)] - fs / 8) < fs / nfft
    # shape matches scipy.welch (rectangular segmenting, hann, no overlap)
    f_sp, p_sp = sp_signal.welch(x[: (n // nfft) * nfft], fs=fs, nperseg=nfft,
                                 noverlap=0, window="hann", detrend=False,
                                 return_onesided=False, scaling="spectrum")
    ref_db = 10 * np.log10(np.fft.fftshift(p_sp) + 1e-30)
    # compare the top 20 dB of the spectrum (noise floor differs by eps)
    mask = ref_db > ref_db.max() - 20.0
    assert np.max(np.abs(pvals[mask] - ref_db[mask])) < 0.5


def test_audio_sink_channel_major_blocks(tmp_path):
    """(channels, n) runtime-layout blocks (what the stereo decoder emits)
    must be interleaved into frames, across multiple write calls."""
    p = tmp_path / "st"
    L = np.arange(10, dtype=np.float32)
    R = -np.arange(10, dtype=np.float32)
    snk = cs.AudioFileSink(str(p), 8000, 2)
    snk(np.stack([L[:6], R[:6]]))
    snk(np.stack([L[6:], R[6:]]))
    snk.close()
    from csdr_tpu.io.wav import read_wav
    audio, sr = read_wav(str(p) + ".wav")
    assert np.array_equal(audio[:, 0], L) and np.array_equal(audio[:, 1], R)


def test_tee_sink(tmp_path):
    p = tmp_path / "tee.f32"
    raw = cs.RawFileSink(str(p))
    col = cs.CollectSink()
    tee = cs.TeeSink(raw, col)
    data = np.arange(100, dtype=np.float32)
    tee(data[:60])
    tee(data[60:])
    tee.close()
    assert np.array_equal(np.fromfile(str(p), dtype=np.float32), data)
    assert np.array_equal(col.concat(), data)


def test_playback_sink_streams_pcm(tmp_path):
    """PlaybackSink pipes float32le PCM into the player's stdin; the {rate}
    and {channels} placeholders are substituted; (channels, n) runtime-layout
    blocks are interleaved into frames."""
    out = tmp_path / "pcm.bin"
    log = tmp_path / "argv.txt"
    cmd = f"sh -c 'echo $0 $1 > {log}; cat > {out}' {{rate}} {{channels}}"
    snk = cs.PlaybackSink(48000, channels=2, command=cmd)
    blk = np.arange(8, dtype=np.float32).reshape(2, 4)  # (channels, n)
    snk(blk)
    snk.close()
    assert log.read_text().split() == ["48000", "2"]
    got = np.frombuffer(out.read_bytes(), dtype=np.float32)
    assert np.array_equal(got, blk.T.ravel())  # interleaved L R L R ...


def test_playback_sink_dead_player_is_nonfatal(tmp_path):
    """A player that exits mid-stream must not kill the capture (like
    unplugging headphones): writes become no-ops, close() still works."""
    snk = cs.PlaybackSink(8000, command="true")
    snk.proc.wait()
    for _ in range(64):  # enough to overflow the pipe buffer → EPIPE
        snk(np.zeros(1 << 16, np.float32))
    assert not snk.alive
    snk.close()


def test_playback_sink_no_player_raises(monkeypatch):
    import shutil

    monkeypatch.delenv("CSDR_PLAYER", raising=False)
    monkeypatch.setattr(shutil, "which", lambda _: None)
    import pytest

    with pytest.raises(FileNotFoundError):
        cs.PlaybackSink(8000)


def test_truncated_capture_files_drop_partial_sample(tmp_path):
    """A capture truncated mid-sample (killed recorder) must end the stream
    cleanly, not crash np.frombuffer."""
    p = tmp_path / "t.cf32"
    iq = np.arange(10, dtype=np.complex64)
    with open(p, "wb") as f:
        f.write(iq.tobytes()[:-3])  # last sample cut mid-float
    from csdr_tpu.io.sources import cf32_file_source, f32_file_source
    got = np.concatenate(list(cf32_file_source(str(p), chunk_size=4)))
    assert np.array_equal(got, iq[:9])
    p2 = tmp_path / "t.f32"
    x = np.arange(7, dtype=np.float32)
    with open(p2, "wb") as f:
        f.write(x.tobytes()[:-2])
    got2 = np.concatenate(list(f32_file_source(str(p2), chunk_size=3)))
    assert np.array_equal(got2, x[:6])
