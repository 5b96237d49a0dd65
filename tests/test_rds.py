"""RDS decoder: CRC/offset algebra, and full-chain decode of a synthetic
pilot-locked MPX (PS name + RadioText recovered exactly)."""

import numpy as np
import pytest

import csdr_tpu as cs
from csdr_tpu.models import rds


def test_crc_block_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        m = int(rng.integers(0, 1 << 16))
        for off in rds.OFFSETS:
            blk = rds.encode_block(m, off)
            assert blk >> 10 == m
            # a valid block's syndrome is its offset word
            assert rds.syndrome(blk) == rds.OFFSETS[off]
    # corrupting any single bit breaks the syndrome match
    blk = rds.encode_block(0x1234, "A")
    for i in range(26):
        assert rds.syndrome(blk ^ (1 << i)) != rds.OFFSETS["A"]


def test_groups_roundtrip_bits_only():
    """Protocol layer alone: serialize groups → differential bits →
    slicer-style decode (xor with previous) → group parse."""
    pi = 0x52D4
    ps = "CSDR-TPU"
    groups = [rds.make_group_0a(pi, s, ps[2 * s:2 * s + 2]) for s in range(4)]
    rt = "TPU NATIVE SDR  "
    groups += [rds.make_group_2a(pi, s, rt[4 * s:4 * s + 4]) for s in range(4)]
    t = rds.bits_from_groups(groups)
    m = np.bitwise_xor(t, np.concatenate([[0], t[:-1]]).astype(np.uint8))
    out = rds.decode_groups(m)
    assert out["pi"] == pi
    assert out["ps"] == ps.rstrip()
    assert out["rt"] == rt.rstrip()
    assert out["groups"] == 8


def _mpx_with_rds(quad, n, phi, groups):
    t = np.arange(n) / quad
    fL, fR = 800.0, 2500.0
    L = 0.6 * np.sin(2 * np.pi * fL * t)
    R = 0.6 * np.sin(2 * np.pi * fR * t)
    pilot_ph = 2 * np.pi * 19000.0 * t + phi
    mpx = (0.45 * (L + R) + 0.1 * np.cos(pilot_ph)
           + 0.45 * (L - R) * np.cos(2 * pilot_ph))

    tx = rds.bits_from_groups(groups)
    # biphase waveform at the exact pilot-locked bit clock (1187.5 = 19k/16)
    bit_idx = np.floor(t * rds.RDS_BAUD).astype(np.int64) % len(tx)
    half = np.floor(t * 2 * rds.RDS_BAUD).astype(np.int64) % 2
    lvl = (tx[bit_idx] * 2.0 - 1.0) * np.where(half == 0, 1.0, -1.0)
    mpx += 0.12 * lvl * np.cos(3 * pilot_ph)
    return mpx.astype(np.float32)


def test_rds_full_chain_decodes_ps_and_rt():
    quad = 192000.0
    pi = 0x52D4
    ps = "CSDR-TPU"
    rt = "TPU NATIVE RADIO"
    groups = [rds.make_group_0a(pi, s, ps[2 * s:2 * s + 2]) for s in range(4)]
    groups += [rds.make_group_2a(pi, s, rt[4 * s:4 * s + 4]) for s in range(4)]

    g = rds.rds_receiver(quad)
    n = (int(quad * 1.6) // g.granule) * g.granule  # ~1.6 s ≈ 1900 bits
    mpx = _mpx_with_rds(quad, n, 0.7, groups)

    sink = cs.CollectSink()
    cs.Pipeline(g, g.granule * max(1, (1 << 16) // g.granule)).run(
        iter([mpx]), sink)
    bits = sink.concat()
    assert bits.dtype == np.uint8 and len(bits) >= 1500

    out = rds.decode_groups(bits)
    assert out["groups"] >= 8, out
    assert out["pi"] == pi, out
    assert out["ps"] == ps, out
    assert out["rt"] == rt.rstrip(), out


def test_cli_defms_rds_flag(tmp_path, monkeypatch):
    """Full CLI path: FM capture with RDS -> DeFMS --rds -> stereo WAV +
    <output>.rds.txt carrying the PS name."""
    import os

    from csdr_tpu.apps.soapy_sdr_cli import main as cli_main

    monkeypatch.chdir(tmp_path)
    quad = 192000.0
    pi, ps = 0x52D4, "CSDR-TPU"
    groups = [rds.make_group_0a(pi, s, ps[2 * s:2 * s + 2]) for s in range(4)]
    g = rds.rds_receiver(quad)
    n = (int(quad * 1.2) // g.granule) * g.granule
    # keep per-sample phase steps well under pi (|mpx| ≈ 1.5 would alias at
    # kf=0.8); the decoders are scale-invariant (normalized pilot, sign
    # slicing), so a 0.25x composite works fine
    mpx = 0.25 * _mpx_with_rds(quad, n, 0.7, groups)
    iq = np.exp(1j * np.cumsum(2 * np.pi * 0.8 * mpx)).astype(np.complex64)
    iq.tofile("cap.cf32")

    rc = cli_main(["--filename", "cap.cf32", "-s", str(quad), "-n", str(n),
                   "--demod", "DeFMS 4 WAV", "--rds", "-o", "st"])
    assert rc == 0
    assert os.path.exists("st.wav")
    txt = open("st.rds.txt").read()
    assert f"PS: {ps}" in txt and f"PI: {pi:04X}" in txt


@pytest.mark.parametrize("dt", [2, 4])
def test_sharded_rds_receiver_bit_identical(dt):
    """The RDS chain (pilot-locked baseband → rational resampler → bit
    slicer with psum'd phase energies) sharded over time produces exactly
    the single-device bit stream."""
    import jax
    from jax.sharding import Mesh
    from csdr_tpu.parallel.generic import ShardedChain
    from csdr_tpu.core.runtime import Pipeline, decode_tree_host

    if dt > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = Mesh(np.asarray(jax.devices()[:dt]).reshape(dt, 1), ("time", "ch"))

    quad = 192000.0
    pi, ps = 0x52D4, "CSDR-TPU"
    groups = [rds.make_group_0a(pi, s, ps[2 * s:2 * s + 2]) for s in range(4)]
    g = rds.rds_receiver(quad)
    block = g.granule * dt * max(1, (1 << 16) // (g.granule * dt))
    n = 2 * block
    mpx = _mpx_with_rds(quad, n, 0.7, groups)

    ref_pipe = Pipeline(rds.rds_receiver(quad), block)
    sc = ShardedChain(rds.rds_receiver(quad), mesh, block)
    st = sc.init()
    for i in range(2):
        blk = mpx[i * block:(i + 1) * block]
        ref = np.asarray(decode_tree_host(ref_pipe.process_block(blk)))
        st, y = sc.step(st, blk)
        got = np.asarray(decode_tree_host(y))
        assert np.array_equal(got, ref), (dt, i, int(np.sum(got != ref)))


def test_cli_defms_rds_mesh_matches_serial(tmp_path, monkeypatch):
    """`DeFMS --rds --mesh` (the most complex production graph: multi-rate
    Tee of stereo decoder + RDS receiver) produces the same stereo WAV bytes
    and the same decoded RDS text as the serial run."""
    import os

    from csdr_tpu.apps.soapy_sdr_cli import main as cli_main

    monkeypatch.chdir(tmp_path)
    quad = 192000.0
    pi, ps = 0x52D4, "CSDR-TPU"
    groups = [rds.make_group_0a(pi, s, ps[2 * s:2 * s + 2]) for s in range(4)]
    g = rds.rds_receiver(quad)
    n = (int(quad * 1.2) // g.granule) * g.granule
    mpx = 0.25 * _mpx_with_rds(quad, n, 0.7, groups)
    iq = np.exp(1j * np.cumsum(2 * np.pi * 0.8 * mpx)).astype(np.complex64)
    iq.tofile("cap.cf32")

    base = ["--filename", "cap.cf32", "-s", str(quad), "-n", str(n),
            "--demod", "DeFMS 4 WAV", "--rds"]
    assert cli_main(base + ["-o", "serial"]) == 0
    assert cli_main(base + ["--mesh", "2x1", "-o", "meshed"]) == 0
    assert open("serial.wav", "rb").read() == open("meshed.wav", "rb").read()
    assert open("serial.rds.txt").read() == open("meshed.rds.txt").read()
    assert f"PS: {ps}" in open("meshed.rds.txt").read()
