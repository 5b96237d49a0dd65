"""Wide-layout (128-lane) fused flagship kernel vs the original kernel and
the XLA block path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

import csdr_tpu as cs
from csdr_tpu.ops.pallas.flagship_fused import (flagship_fused_init,
                                                flagship_fused_step)
from csdr_tpu.ops.pallas import flagship_fused_wide as ffw
from csdr_tpu.ops.pallas.flagship_fused_wide import (flagship_fused_wide_init,
                                                     flagship_fused_wide_step)


def xla_reference(iq, nch, blocks):
    g = cs.chain(cs.dc_blocker(), cs.firpfbch_channelizer(nch),
                 cs.PerChannel(cs.fm_demodulator(0.6), nch))
    st = g.init()
    outs = []
    n = len(iq) // blocks
    for i in range(blocks):
        st, y = g.apply(st, jnp.asarray(iq[i * n:(i + 1) * n]))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=1)


def _signal(nch, tileF, blocks=2, seed=0):
    rng = np.random.default_rng(seed)
    n = nch * tileF * 2 * blocks
    t = np.arange(n)
    return (0.3 * np.exp(2j * np.pi * np.mod(0.213 * t, 1.0))
            + 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
            ).astype(np.complex64)


@pytest.mark.parametrize("nch,tileF", [(8, 64), (16, 128), (64, 128)])
def test_wide_matches_xla_and_orig(nch, tileF):
    iq = _signal(nch, tileF)
    n = len(iq)
    want = xla_reference(iq, nch, blocks=2)

    st_w = flagship_fused_wide_init(nch)
    st_o = flagship_fused_init(nch)
    outs_w, outs_o = [], []
    half = n // 2
    for i in range(2):
        blk = jnp.asarray(iq[i * half:(i + 1) * half])
        st_w, yw = flagship_fused_wide_step(st_w, blk, nch=nch, tileF=tileF,
                                            interpret=True)
        st_o, yo = flagship_fused_step(st_o, blk, nch=nch, tileF=tileF,
                                       interpret=True)
        outs_w.append(np.asarray(yw))
        outs_o.append(np.asarray(yo))
    got_w = np.concatenate(outs_w, axis=1)
    got_o = np.concatenate(outs_o, axis=1)

    assert got_w.shape == want.shape
    # frame 0: demod seed differs; tolerance dominated by the shared bf16_3x
    # DFT floor (the original kernel sits in the same band).  The max error
    # is an isolated tail sample where atan2 amplifies a near-zero channel
    # magnitude (measured: rms 1.4e-5, p99 4.6e-5, max 7.3e-4 at nch=64) —
    # bound the tail loosely and the rms tightly.
    err = np.abs(got_w[:, 1:] - want[:, 1:])
    assert np.max(err) < 1.2e-3, np.max(err)
    assert np.sqrt(np.mean(err ** 2)) < 4e-5, np.sqrt(np.mean(err ** 2))
    # consistency with the original kernel: both are ~6e-4 from the oracle
    # (bf16_3x DFT floor + differing fp32 DC-solve blocking), so their mutual
    # distance can reach ~1e-3; the oracle bound above is the real check
    err_orig = np.max(np.abs(got_w - got_o))  # incl. frame 0: same seed logic
    assert err_orig < 1.5e-3, err_orig


def test_wide_u8_planes_match_orig_u8():
    rng = np.random.default_rng(2)
    nch, tileF = 16, 64
    n = nch * tileF * 2
    u8 = rng.integers(0, 256, 2 * n).astype(np.uint8)
    planes = (jnp.asarray(u8[0::2]), jnp.asarray(u8[1::2]))
    st_w = flagship_fused_wide_init(nch)
    st_o = flagship_fused_init(nch)
    st_w, yw = flagship_fused_wide_step(st_w, planes, nch=nch, tileF=tileF,
                                        interpret=True)
    st_o, yo = flagship_fused_step(st_o, planes, nch=nch, tileF=tileF,
                                   interpret=True)
    err = np.max(np.abs(np.asarray(yw) - np.asarray(yo)))
    assert err < 2e-4, err


def test_wide_rejects_bad_shapes():
    with pytest.raises(ValueError, match="nch"):
        flagship_fused_wide_init(48)
    st = flagship_fused_wide_init(64)
    x = jnp.zeros((64 * 128,), jnp.complex64)
    with pytest.raises(ValueError, match="tileF"):
        flagship_fused_wide_step(st, x, nch=64, tileF=127, interpret=True)


def test_skip_gates_compile_and_reduce_work():
    """The ablation gates (benchmarks/probe_ablation.py) compile in every
    ladder configuration and the full build is the default (skip=())."""
    nch, tileF = 16, 64
    iq = _signal(nch, tileF, blocks=1)
    for skip in [(), ("atan2",), ("demod",), ("demod", "dft"),
                 ("demod", "dft", "fir"),
                 ("demod", "dft", "fir", "nco"),
                 ("demod", "dft", "fir", "nco", "dc")]:
        st = flagship_fused_wide_init(nch)
        st, y = flagship_fused_wide_step(st, jnp.asarray(iq), nch=nch,
                                         tileF=tileF, interpret=True,
                                         skip=skip)
        assert y.shape == (nch, len(iq) // nch)
        assert np.isfinite(np.asarray(y)).all()


def test_dc_hier_matches_production_dc_only():
    """The two-level row-carry solve (the PRODUCTION default since round 3,
    +17% on chip — KERNEL_OPTS_r03) matches the dense solve
    (opts="dc_dense") on the DC stage itself: all later stages skipped, so
    the kernel output IS the DC-blocked stream (plus history slices) — no
    atan2 branch sensitivity.  Multi-tile + multi-block to cover SMEM carry
    hand-off."""
    nch, tileF = 64, 512          # tileH=256 -> B=128, G=2
    iq = _signal(nch, tileF, blocks=2, seed=3)
    half = len(iq) // 2
    skip = ("demod", "dft", "fir", "nco")
    sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
    for i in range(2):
        blk = jnp.asarray(iq[i * half:(i + 1) * half])
        sa, ya = flagship_fused_wide_step(sa, blk, nch=nch, tileF=tileF,
                                          interpret=True, skip=skip,
                                          opts=("dc_dense",))
        sb, yb = flagship_fused_wide_step(sb, blk, nch=nch, tileF=tileF,
                                          interpret=True, skip=skip)
        err = np.max(np.abs(np.asarray(ya) - np.asarray(yb)))
        assert err < 2e-5, (i, err)
    for k in ("hist_re", "hist_im", "scal"):
        err = np.max(np.abs(np.asarray(sa[k]) - np.asarray(sb[k])))
        assert err < 2e-5, (k, err)


def test_dc_hier_full_kernel_both_layouts():
    """The hier default through the FULL kernel (both layouts): audio
    matches the dense solve except isolated atan2 branch flips on
    noise-only channels (a ~1e-6 DC difference can flip the wrap branch
    near +-pi)."""
    from csdr_tpu.ops.pallas.flagship_fused import (flagship_fused_init as oi,
                                                    flagship_fused_step as os_)
    for init, step, nch, tileF in (
            (oi, os_, 64, 256),
            (flagship_fused_wide_init, flagship_fused_wide_step, 64, 512)):
        iq = _signal(nch, 256, blocks=2, seed=4)
        half = len(iq) // 2
        sa, sb = init(nch), init(nch)
        for i in range(2):
            blk = jnp.asarray(iq[i * half:(i + 1) * half])
            sa, ya = step(sa, blk, nch=nch, tileF=tileF, interpret=True,
                          opts=("dc_dense",))
            sb, yb = step(sb, blk, nch=nch, tileF=tileF, interpret=True)
            d = np.abs(np.asarray(ya) - np.asarray(yb))
            assert float(np.mean(d > 0.01)) < 0.005, float(np.mean(d > 0.01))
            assert float(np.quantile(d, 0.99)) < 1e-4, float(np.quantile(d, 0.99))
        for k in ("hist_re", "hist_im", "scal"):
            err = np.max(np.abs(np.asarray(sa[k]) - np.asarray(sb[k])))
            assert err < 2e-5, (k, err)


def test_ablate_sub_gates_compile():
    """The sub-stage ablation gates (probe_ablation sub-ladder) compile and
    produce finite output in every configuration."""
    nch, tileF = 16, 64
    iq = _signal(nch, tileF, blocks=1)
    for skip in [("atan_div",), ("atan_poly",), ("atan_sel",), ("atan_rr",),
                 ("dc_md",), ("dc_rowcarry",), ("dc_md", "dc_rowcarry")]:
        st = flagship_fused_wide_init(nch)
        st, y = flagship_fused_wide_step(st, jnp.asarray(iq), nch=nch,
                                         tileF=tileF, interpret=True,
                                         skip=skip)
        assert np.isfinite(np.asarray(y)).all(), skip


def test_opts_gates_match_production_u8():
    """The u8 stacked-conversion branch of the opts gates (the exact
    configuration probe_kernel_opts benchmarks: input 'u8_wide') matches the
    production u8 path — interleaved cu8 planes, both kernels."""
    from csdr_tpu.ops.pallas.flagship_fused import (flagship_fused_init as oi,
                                                    flagship_fused_step as os_)
    rng = np.random.default_rng(5)
    nch, tileF = 16, 64
    n = nch * tileF * 2
    u8 = rng.integers(0, 256, 2 * n).astype(np.uint8)
    planes = (jnp.asarray(u8[0::2]), jnp.asarray(u8[1::2]))
    for init, step in ((oi, os_),
                       (flagship_fused_wide_init, flagship_fused_wide_step)):
        # dc_dense baseline: the stacked solve is bit-identical to the
        # DENSE algebra (the hier default differs at ~1e-6 fp order)
        sd, se = init(nch), init(nch)
        sd, yd = step(sd, planes, nch=nch, tileF=tileF, interpret=True,
                      opts=("dc_dense",))
        se, ye = step(se, planes, nch=nch, tileF=tileF, interpret=True,
                      opts=("dc_stack", "fast_atan"))
        assert np.max(np.abs(np.asarray(yd) - np.asarray(ye))) < 5e-7
        for k in ("hist_re", "hist_im", "scal"):
            assert np.array_equal(np.asarray(sd[k]), np.asarray(se[k])), k


def test_opts_gates_match_production():
    """The experiment gates (probe_kernel_opts.py) compile and match the
    production paths: stacked DC is bit-identical algebra (state must match
    exactly), fast-reciprocal atan2 is within 1 ulp on the audio."""
    from csdr_tpu.ops.pallas.flagship_fused import (flagship_fused_init as oi,
                                                    flagship_fused_step as os_)
    nch, tileF = 16, 64
    iq = _signal(nch, tileF, blocks=1)
    for init, step in ((oi, os_),
                       (flagship_fused_wide_init, flagship_fused_wide_step)):
        sd, se = init(nch), init(nch)
        sd, yd = step(sd, jnp.asarray(iq), nch=nch, tileF=tileF,
                      interpret=True, opts=("dc_dense",))
        se, ye = step(se, jnp.asarray(iq), nch=nch, tileF=tileF,
                      interpret=True, opts=("dc_stack", "fast_atan"))
        assert np.max(np.abs(np.asarray(yd) - np.asarray(ye))) < 5e-7
        for k in ("hist_re", "hist_im", "scal"):
            assert np.array_equal(np.asarray(sd[k]), np.asarray(se[k])), k


def test_audio_frames_layout_matches_transposed():
    """opts=("audio_frames",) returns the same audio frame-major: y_frames.T
    must equal the default channel-major output exactly."""
    from csdr_tpu.ops.pallas.flagship_fused import (flagship_fused_init as oi,
                                                    flagship_fused_step as os_)
    nch, tileF = 16, 64
    iq = _signal(nch, tileF, blocks=1, seed=6)
    for init, step in ((oi, os_),
                       (flagship_fused_wide_init, flagship_fused_wide_step)):
        sa, sb = init(nch), init(nch)
        sa, ya = step(sa, jnp.asarray(iq), nch=nch, tileF=tileF,
                      interpret=True)
        sb, yb = step(sb, jnp.asarray(iq), nch=nch, tileF=tileF,
                      interpret=True, opts=("audio_frames",))
        assert yb.shape == (len(iq) // nch, nch)
        assert np.array_equal(np.asarray(ya), np.asarray(yb).T)


def test_dft_kara_matches_production():
    """The 3-multiply (Karatsuba) DFT gate matches the 4-multiply cdot3
    within its slightly higher (−88 dB class) error floor."""
    nch, tileF = 16, 64
    iq = _signal(nch, tileF, blocks=1, seed=7)
    sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
    sa, ya = flagship_fused_wide_step(sa, jnp.asarray(iq), nch=nch,
                                      tileF=tileF, interpret=True)
    sb, yb = flagship_fused_wide_step(sb, jnp.asarray(iq), nch=nch,
                                      tileF=tileF, interpret=True,
                                      opts=("dft_kara",))
    d = np.abs(np.asarray(ya) - np.asarray(yb))
    # isolated atan2 branch flips on noise channels aside, the audio sits
    # within the combined bf16x3 floors
    assert float(np.mean(d > 0.01)) < 0.005, float(np.mean(d > 0.01))
    assert float(np.quantile(d, 0.99)) < 3e-4, float(np.quantile(d, 0.99))
    for k in ("hist_re", "hist_im"):
        assert np.allclose(np.asarray(sa[k]), np.asarray(sb[k]), atol=1e-6)


@pytest.mark.parametrize("nch", [16, 64])
def test_nco_fold_matches_legacy_ramp(nch):
    """The NCO fold (production default since round 4) compiles the NCO
    stage out entirely — the lane phase e^{−jωℓ} folds into the DFT
    constant, the per-tap residual (−1)^{(nch−1)J} into the tap panel, and
    the carried global phase cancels in the demod conjugate product.  Audio
    must match the legacy explicit-ramp path (opts=("nco_ramp",)) within
    the bf16x3 DFT floor ACROSS block boundaries (the fold changes what
    hist carries — pre-rotation rows — so streaming continuity is the thing
    to verify)."""
    tileF = 64 if nch == 16 else 128
    iq = _signal(nch, tileF, blocks=2, seed=11)
    half = len(iq) // 2
    for extra in ((), ("dft_kara",)):
        sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
        ya_all, yb_all = [], []
        for i in range(2):
            blk = jnp.asarray(iq[i * half:(i + 1) * half])
            sa, ya = flagship_fused_wide_step(
                sa, blk, nch=nch, tileF=tileF, interpret=True,
                opts=extra + ("nco_ramp",))
            sb, yb = flagship_fused_wide_step(
                sb, blk, nch=nch, tileF=tileF, interpret=True, opts=extra)
            ya_all.append(np.asarray(ya))
            yb_all.append(np.asarray(yb))
        d = np.abs(np.concatenate(ya_all, axis=1)
                   - np.concatenate(yb_all, axis=1))
        # same floor class as the dft_kara gate: atan2 branch flips on
        # noise-only channels aside, audio sits within the bf16x3 floors
        assert float(np.mean(d > 0.01)) < 0.005, (extra, float(np.mean(d > 0.01)))
        assert float(np.quantile(d, 0.99)) < 3e-4, (extra, float(np.quantile(d, 0.99)))


def test_nco_fold_u8_matches_legacy_u8():
    """The fold under cu8 input (the exact production streaming config)."""
    nch, tileF = 64, 128
    iq = _signal(nch, tileF, blocks=1, seed=12)
    pairs = np.stack([np.clip(np.round((iq.real + 1) * 127.5), 0, 255),
                      np.clip(np.round((iq.imag + 1) * 127.5), 0, 255)],
                     axis=1).astype(np.uint8).reshape(-1)
    u8 = jnp.asarray(pairs)
    sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
    sa, ya = flagship_fused_wide_step(sa, u8, nch=nch, tileF=tileF,
                                      interpret=True, opts=("nco_ramp",))
    sb, yb = flagship_fused_wide_step(sb, u8, nch=nch, tileF=tileF,
                                      interpret=True)
    d = np.abs(np.asarray(ya) - np.asarray(yb))
    assert float(np.mean(d > 0.01)) < 0.005, float(np.mean(d > 0.01))
    assert float(np.quantile(d, 0.99)) < 3e-4, float(np.quantile(d, 0.99))


def test_split2_bit_identical_to_single_chain():
    """The split2 default (two half-tile FIR→DFT→demod chains, production
    since round 4) re-orders nothing semantically — it computes the exact
    same per-row arithmetic as the single chain (opts=("split1",)), so the
    audio must be BIT-identical (and composable with the other gates)."""
    nch, tileF = 64, 256   # tileH = 128, halfH = 64 >= histrows = 9
    iq = _signal(nch, tileF, blocks=2, seed=13)
    half = len(iq) // 2
    for extra in ((), ("nco_ramp", "dft_kara")):
        sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
        for i in range(2):
            blk = jnp.asarray(iq[i * half:(i + 1) * half])
            sa, ya = flagship_fused_wide_step(
                sa, blk, nch=nch, tileF=tileF, interpret=True,
                opts=extra + ("split1",))
            sb, yb = flagship_fused_wide_step(
                sb, blk, nch=nch, tileF=tileF, interpret=True, opts=extra)
            assert np.array_equal(np.asarray(ya), np.asarray(yb)), extra
        for k in ("hist_re", "hist_im", "scal"):
            assert np.array_equal(np.asarray(sa[k]), np.asarray(sb[k])), k


def test_split4_bit_identical():
    """opts=("split4",) — the deeper 4-chain pipeline gate — is bit-identical
    to production (2 chains) and to the single chain."""
    nch, tileF = 64, 256   # tileH = 128, partH = 32 >= histrows = 9
    iq = _signal(nch, tileF, blocks=1, seed=14)
    outs = []
    for opts in (("split1",), (), ("split4",)):
        s = flagship_fused_wide_init(nch)
        s, y = flagship_fused_wide_step(s, jnp.asarray(iq), nch=nch,
                                        tileF=tileF, interpret=True,
                                        opts=opts)
        outs.append(np.asarray(y))
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])


def test_interleave_bit_identical():
    """opts=("interleave",) — stage-major emission across the split chains —
    is pure re-ordering of an identical dataflow: bit-identical audio."""
    nch, tileF = 64, 256
    iq = _signal(nch, tileF, blocks=1, seed=16)
    sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
    sa, ya = flagship_fused_wide_step(sa, jnp.asarray(iq), nch=nch,
                                      tileF=tileF, interpret=True)
    sb, yb = flagship_fused_wide_step(sb, jnp.asarray(iq), nch=nch,
                                      tileF=tileF, interpret=True,
                                      opts=("interleave",))
    assert np.array_equal(np.asarray(ya), np.asarray(yb))


def test_dc_pipe_bit_identical():
    """opts=("dc_pipe",) — cross-grid-step DC pipelining — computes the SAME
    solves in the same order, just one grid step early: audio and carried
    state are bit-identical to production.  Multi-tile (T=4) so the pipeline
    actually pipelines, multi-block for the scal/hist hand-off, f32 and u8."""
    nch, tileF = 64, 256
    iq = _signal(nch, tileF, blocks=4, seed=19)   # 2 blocks x T=4 tiles
    half = len(iq) // 2
    re = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    im = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    for u8 in (False, True):
        sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
        for i in range(2):
            if u8:
                blk = (jnp.asarray(re[i * half:(i + 1) * half]),
                       jnp.asarray(im[i * half:(i + 1) * half]))
            else:
                blk = jnp.asarray(iq[i * half:(i + 1) * half])
            sa, ya = flagship_fused_wide_step(sa, blk, nch=nch, tileF=tileF,
                                              interpret=True)
            sb, yb = flagship_fused_wide_step(sb, blk, nch=nch, tileF=tileF,
                                              interpret=True,
                                              opts=("dc_pipe",))
            assert np.array_equal(np.asarray(ya), np.asarray(yb)), (u8, i)
        for k in ("hist_re", "hist_im", "scal"):
            assert np.array_equal(np.asarray(sa[k]), np.asarray(sb[k])), (u8, k)


def test_dc_split_matches_production():
    """opts=("dc_split",) — per-half DC solve with threaded carry — same
    recurrence, different blocking: ~1e-6-class diffs like hier-vs-dense.
    DC-only check (later stages skipped) plus full-kernel audio check,
    multi-block for the carry hand-off."""
    # tileH = 512, halves of 256 -> hierB2 = 128: the smallest tile where the
    # dc_split branch actually compiles (tileF=512 gave halves of 128, whose
    # _hier_group is None — the gate silently fell through to production and
    # this test compared production against itself)
    nch, tileF = 64, 1024
    iq = _signal(nch, tileF, blocks=2, seed=17)
    half = len(iq) // 2
    skip = ("demod", "dft", "fir", "nco")
    ffw._trace_log.clear()
    sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
    for i in range(2):
        blk = jnp.asarray(iq[i * half:(i + 1) * half])
        sa, ya = flagship_fused_wide_step(sa, blk, nch=nch, tileF=tileF,
                                          interpret=True, skip=skip)
        sb, yb = flagship_fused_wide_step(sb, blk, nch=nch, tileF=tileF,
                                          interpret=True, skip=skip,
                                          opts=("dc_split",))
        err = np.max(np.abs(np.asarray(ya) - np.asarray(yb)))
        assert err < 2e-5, (i, err)
    for k in ("hist_re", "hist_im", "scal"):
        err = np.max(np.abs(np.asarray(sa[k]) - np.asarray(sb[k])))
        assert err < 2e-5, (k, err)
    # the variant path must have actually compiled (trace-time marker) —
    # guards against the gate silently degrading to the production solve
    assert "dc_split_active" in ffw._trace_log, ffw._trace_log
    assert "dc_split_inactive" not in ffw._trace_log, ffw._trace_log

    sa, sb = flagship_fused_wide_init(nch), flagship_fused_wide_init(nch)
    for i in range(2):
        blk = jnp.asarray(iq[i * half:(i + 1) * half])
        sa, ya = flagship_fused_wide_step(sa, blk, nch=nch, tileF=tileF,
                                          interpret=True)
        sb, yb = flagship_fused_wide_step(sb, blk, nch=nch, tileF=tileF,
                                          interpret=True, opts=("dc_split",))
        d = np.abs(np.asarray(ya) - np.asarray(yb))
        assert float(np.mean(d > 0.01)) < 0.005, float(np.mean(d > 0.01))
        assert float(np.quantile(d, 0.99)) < 1e-4, float(np.quantile(d, 0.99))
