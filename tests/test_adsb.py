"""ADS-B receiver (models/adsb.py): CRC-24, CPR codec, PPM bit layer and the
full preamble-correlation chain, validated as an exact encoder/decoder
inverse pair — the aviation sibling of test_ais.py."""

import numpy as np
import pytest

import csdr_tpu as cs
from csdr_tpu.models import adsb

FS = 2e6  # k = 2 samples/µs (the classic rtl 2 MS/s configuration)


def test_crc24_frame_remainder_zero():
    f = adsb.make_es_ident(0x4840D6, "KLM1023")
    assert len(f) == 112
    assert adsb.crc24(f) == 0
    bad = f.copy()
    bad[40] ^= 1
    assert adsb.crc24(bad) != 0


def test_ident_roundtrip_and_crc_rejection():
    f = adsb.make_es_ident(0x4840D6, "KLM1023")
    m = adsb.decode_frame(f)
    assert m == {"df": 17, "icao": 0x4840D6, "tc": 4, "callsign": "KLM1023"}
    bad = f.copy()
    bad[60] ^= 1
    assert adsb.decode_frame(bad) is None


def test_velocity_roundtrip():
    f = adsb.make_es_velocity(0xA1B2C3, vx_kn=-120.0, vy_kn=209.0,
                              vrate_fpm=-1024)
    m = adsb.decode_frame(f)
    assert m["icao"] == 0xA1B2C3 and m["tc"] == 19
    assert abs(m["speed_kn"] - np.hypot(120.0, 209.0)) < 1e-9
    want_track = np.degrees(np.arctan2(-120.0, 209.0)) % 360.0
    assert abs(m["track_deg"] - want_track) < 1e-9
    assert m["vrate_fpm"] == -1024


@pytest.mark.parametrize("lat,lon", [
    (52.25720, 3.91937),       # mode-s.org worked example region
    (-33.85678, 151.21543),    # southern/eastern hemisphere
    (64.15000, -21.95000),     # high latitude (small NL)
])
def test_cpr_global_roundtrip(lat, lon):
    ye, xe = adsb.cpr_encode(lat, lon, odd=False)
    yo, xo = adsb.cpr_encode(lat, lon, odd=True)
    got = adsb.cpr_global(ye, xe, yo, xo, newest_odd=True)
    assert got is not None
    assert abs(got[0] - lat) < 3e-4 and abs(got[1] - lon) < 3e-4
    got = adsb.cpr_global(ye, xe, yo, xo, newest_odd=False)
    assert abs(got[0] - lat) < 3e-4 and abs(got[1] - lon) < 3e-4


def test_position_pairing():
    icao, lat, lon, alt = 0x3C6444, 52.25720, 3.91937, 38000
    even = adsb.decode_frame(adsb.make_es_position(icao, lat, lon, alt, odd=False))
    odd = adsb.decode_frame(adsb.make_es_position(icao, lat, lon, alt, odd=True))
    assert even["alt_ft"] == alt and even["cpr_odd"] == 0 and odd["cpr_odd"] == 1
    paired = adsb.pair_positions([even, odd])
    assert "lat_deg" not in paired[0]  # no pair yet at the first message
    assert abs(paired[1]["lat_deg"] - lat) < 3e-4
    assert abs(paired[1]["lon_deg"] - lon) < 3e-4
    # different aircraft must not pair
    other = adsb.decode_frame(adsb.make_es_position(0x111111, lat, lon, alt,
                                                    odd=False))
    assert "lat_deg" not in adsb.pair_positions([even, other])[1]


def _burst_stream(frames, gap_us=40, seed=1, amp=1.0, noise=0.02):
    k = int(FS // 1e6)
    gap = np.zeros(gap_us * k, np.float32)
    mag = np.concatenate(
        [gap] + sum(([adsb.adsb_modulate(f, FS, amp), gap] for f in frames), []))
    iq = adsb.to_iq(mag)
    rng = np.random.default_rng(seed)
    return (iq + noise * (rng.normal(size=len(iq))
                          + 1j * rng.normal(size=len(iq)))).astype(np.complex64)


def test_adsb_full_chain():
    """Ident + even/odd position + velocity through the ACTUAL device chain
    (magnitude → preamble matched filter), streamed in blocks, then the
    host-side layer: every field round-trips, including the CPR pair."""
    icao, lat, lon = 0x4840D6, 52.25720, 3.91937
    frames = [
        adsb.make_es_ident(icao, "KLM1023"),
        adsb.make_es_position(icao, lat, lon, 38000, odd=False),
        adsb.make_es_position(icao, lat, lon, 38000, odd=True),
        adsb.make_es_velocity(icao, 120.0, 209.0, vrate_fpm=640),
    ]
    iq = _burst_stream(frames)
    rx = cs.CollectSink()
    cs.Pipeline(adsb.adsb_receiver(FS), block_size=4096).run(iter([iq]), rx)
    msgs = adsb.pair_positions(adsb.decode_collected(rx.concat(), FS))
    assert len(msgs) == 4, msgs
    assert msgs[0]["callsign"] == "KLM1023"
    assert msgs[1]["alt_ft"] == 38000
    assert abs(msgs[2]["lat_deg"] - lat) < 3e-4
    assert abs(msgs[2]["lon_deg"] - lon) < 3e-4
    assert abs(msgs[3]["speed_kn"] - np.hypot(120.0, 209.0)) < 1e-9
    assert msgs[3]["vrate_fpm"] == 640
    assert all(m["icao"] == icao for m in msgs)


def test_adsb_dense_capture_decodes_every_frame():
    """400 back-to-back frames all decode — the candidate scan must not
    exhaust a sample-count budget partway through a busy capture (review
    finding: the old cand[:max_candidates*8] slice dropped the tail)."""
    frames = [adsb.make_es_velocity(0x100000 + i, (i % 300) + 1.0,
                                    ((i * 7) % 300) + 1.0)
              for i in range(400)]
    iq = _burst_stream(frames, gap_us=16, noise=0.01)
    rx = cs.CollectSink()
    cs.Pipeline(adsb.adsb_receiver(FS), block_size=1 << 15).run(iter([iq]), rx)
    msgs = adsb.decode_collected(rx.concat(), FS)
    assert [m["icao"] for m in msgs] == [0x100000 + i for i in range(400)]


def test_decode_collected_empty_run():
    """A 0-sample run leaves CollectSink empty (flat empty array, not the
    Tee tuple): zero messages, not an unpack crash."""
    assert adsb.decode_collected(np.zeros(0), FS) == []


def test_adsb_receiver_validates_rate():
    with pytest.raises(ValueError, match="2n"):
        adsb.adsb_receiver(3e6)  # odd samples/µs
    with pytest.raises(ValueError, match="2n"):
        adsb.adsb_receiver(2.5e6)


@pytest.mark.parametrize("dt", [2, 8])
def test_adsb_chain_shards(dt):
    """The Tee(magnitude, preamble FIR) chain sharded over time matches the
    serial Pipeline exactly (stateless branch + FIR halo)."""
    import jax
    from jax.sharding import Mesh
    from csdr_tpu.core.runtime import Pipeline, decode_tree_host
    from csdr_tpu.parallel.generic import ShardedChain

    if dt > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = Mesh(np.asarray(jax.devices()[:dt]).reshape(dt, 1), ("time", "ch"))
    iq = _burst_stream([adsb.make_es_ident(0x4840D6, "TEST123")], seed=3)
    n = (len(iq) // (2 * dt)) * dt  # two global blocks
    graph = adsb.adsb_receiver(FS)
    ref_pipe = Pipeline(graph, n, donate=False)
    sc = ShardedChain(adsb.adsb_receiver(FS), mesh, n)
    st = sc.init()
    for i in range(2):
        blk = iq[i * n:(i + 1) * n]
        ref_mag, ref_score = decode_tree_host(ref_pipe.process_block(blk))
        st, y = sc.step(st, blk)
        got_mag, got_score = decode_tree_host(y)
        np.testing.assert_allclose(np.asarray(got_mag), np.asarray(ref_mag),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_score), np.asarray(ref_score),
                                   rtol=0, atol=1e-6)


def test_cli_deadsb(tmp_path, monkeypatch, capsys):
    """DeADSB as a first-class --demod string in the main CLI, serial and
    under --mesh."""
    from csdr_tpu.apps.soapy_sdr_cli import main as cli_main

    monkeypatch.chdir(tmp_path)
    icao = 0x4CA1B2
    iq = _burst_stream([adsb.make_es_ident(icao, "RYR77P"),
                        adsb.make_es_velocity(icao, 55.0, -180.0)], seed=11)
    iq.tofile("adsb.cf32")
    for extra, out in (([], "s"), (["--mesh", "4x1"], "m")):
        rc = cli_main(["--filename", "adsb.cf32", "-s", str(FS),
                       "-n", str(len(iq)), "--demod", "DeADSB",
                       "-o", out, "--blocksize", "4096"] + extra)
        assert rc == 0, extra
        txt = open(out + ".adsb.txt").read()
        assert "ident RYR77P" in txt and f"{icao:06X}" in txt, (extra, txt)
    # rate validation propagates as a clean CLI error
    assert cli_main(["--filename", "adsb.cf32", "-s", "3e6",
                     "--demod", "DeADSB"]) == 1


def test_adsb_decode_cli(tmp_path, monkeypatch, capsys):
    from csdr_tpu.apps.adsb_decode import main as adsb_main

    monkeypatch.chdir(tmp_path)
    icao = 0x3C6444
    frames = [
        adsb.make_es_ident(icao, "DLH9U"),
        adsb.make_es_position(icao, 48.35300, 11.78610, 4000, odd=False),
        adsb.make_es_position(icao, 48.35300, 11.78610, 4000, odd=True),
    ]
    _burst_stream(frames, seed=7).tofile("rf.cf32")
    rc = adsb_main(["rf.cf32", "-s", str(FS), "-o", "msgs.csv"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "DLH9U" in out and "3 message(s)" in out
    csv = open("msgs.csv").read().splitlines()
    assert csv[0].startswith("icao,")
    assert any(ln.startswith("3C6444") and "48.353" in ln for ln in csv[1:])
    # wrong rate: clean error
    assert adsb_main(["rf.cf32", "-s", "3e6"]) == 1
