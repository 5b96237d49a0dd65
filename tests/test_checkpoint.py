"""Checkpoint/resume: bit-identical mid-stream continuation."""

import numpy as np

import jax.numpy as jnp

import csdr_tpu as cs
from csdr_tpu.core.checkpoint import save_pipeline, resume_pipeline, save_state, load_state
from csdr_tpu.core.runtime import Pipeline
from csdr_tpu.utils import testsig


def graph():
    return cs.chain(cs.dc_blocker(), cs.mix_down(0.3), cs.fm_demodulator(0.6),
                    cs.fir_decimator(4))


def test_resume_is_bit_identical(tmp_path):
    n = 1 << 16
    rng = np.random.default_rng(0)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    bs = 1 << 14

    # uninterrupted run
    p0 = Pipeline(graph(), block_size=bs, donate=False)
    s0 = cs.CollectSink()
    p0.run(iter([x]), s0)
    want = np.asarray(s0.concat())

    # run half, checkpoint, resume in a fresh pipeline
    half = n // 2
    p1 = Pipeline(graph(), block_size=bs, donate=False)
    s1 = cs.CollectSink()
    p1.run(iter([x[:half]]), s1)
    ckpt = str(tmp_path / "ck.npz")
    save_pipeline(ckpt, p1, position=half)

    p2 = Pipeline(graph(), block_size=bs, donate=False)
    pos = resume_pipeline(ckpt, p2)
    assert pos == half
    s2 = cs.CollectSink()
    p2.run(iter([x[pos:]]), s2)

    got = np.concatenate([np.asarray(s1.concat()), np.asarray(s2.concat())])
    assert np.array_equal(got, want)


def test_signature_mismatch_rejected(tmp_path):
    p = Pipeline(graph(), block_size=1 << 12, donate=False)
    ck = str(tmp_path / "a.npz")
    save_pipeline(ck, p, position=0)
    other = Pipeline(cs.chain(cs.dc_blocker(), cs.am_demodulator()), block_size=1 << 12)
    try:
        resume_pipeline(ck, other)
        assert False, "should have raised"
    except ValueError:
        pass


def test_state_roundtrip_structure(tmp_path):
    blk = cs.firpfbch_channelizer(8)
    st = blk.init()
    path = str(tmp_path / "s.npz")
    save_state(path, st, position=123, signature="pfb")
    st2, pos = load_state(path, blk.init(), signature="pfb")
    assert pos == 123
    import jax
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_periodic_checkpoint_during_run(tmp_path):
    """Pipeline.run(checkpoint_path=..., checkpoint_every=...) writes a
    resumable checkpoint mid-stream."""
    n = 1 << 15
    rng = np.random.default_rng(7)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    ck = str(tmp_path / "periodic.npz")
    p = Pipeline(graph(), block_size=1 << 13, donate=False)
    sink = cs.NullSink()
    p.run(iter([x]), sink, checkpoint_path=ck, checkpoint_every=1 << 14)
    import os
    assert os.path.exists(ck)
    p2 = Pipeline(graph(), block_size=1 << 13, donate=False)
    pos = resume_pipeline(ck, p2)
    assert pos >= 1 << 14
