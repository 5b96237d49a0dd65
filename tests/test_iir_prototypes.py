"""Full IIR prototype surface (butter/cheby1/cheby2/ellip/bessel, lowpass and
f0-centered bandpass) vs scipy.signal.sosfilt float64 oracles.

The reference exports order/fc/f0/Ap/As (/root/reference/src/ComposableSDR/
Liquid.chs:591-651) even though its CLI hard-codes the Butterworth lowpass;
round 1 ignored f0/Ap/As — these tests pin the now-honored surface.
"""

import numpy as np
import pytest
import scipy.signal as sig

import jax.numpy as jnp

import csdr_tpu as cs
from csdr_tpu.core.runtime import Pipeline
from csdr_tpu.utils.iirdes import prototype_sos, sos_to_onepole, IIR_PROTOTYPES
from csdr_tpu.ops.iir import onepole_cascade_init, onepole_cascade_stream


def run_cascade(sos, x, complex_input, nblk=4):
    casc = sos_to_onepole(sos, not complex_input)
    state = onepole_cascade_init(casc, complex_input)
    outs = []
    step = len(x) // nblk
    for i in range(0, len(x), step):
        state, y = onepole_cascade_stream(casc, state, jnp.asarray(x[i:i + step]))
        outs.append(np.asarray(y))
    return np.concatenate(outs)


@pytest.mark.parametrize("ftype", IIR_PROTOTYPES)
@pytest.mark.parametrize("order", [2, 5])
def test_lowpass_prototypes_real(ftype, order):
    rng = np.random.default_rng(0)
    x = rng.normal(size=8192).astype(np.float32)
    sos = prototype_sos(ftype, order, 0.1, ap=1.0, as_db=40.0)
    got = run_cascade(sos, x, complex_input=False)
    want = sig.sosfilt(sos, x.astype(np.float64))
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(got - want)) / scale < 5e-3, ftype


@pytest.mark.parametrize("ftype", ["cheby1", "ellip"])
def test_lowpass_prototypes_complex(ftype):
    rng = np.random.default_rng(1)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
    sos = prototype_sos(ftype, 4, 0.15, ap=0.5, as_db=50.0)
    got = run_cascade(sos, x, complex_input=True)
    want = sig.sosfilt(sos, x.astype(np.complex128))
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(got - want)) / scale < 5e-3


@pytest.mark.parametrize("ftype,order", [("butter", 3), ("cheby2", 3),
                                         ("ellip", 2), ("butter", 2)])
def test_bandpass_f0(ftype, order):
    """f0 ≠ 0 → bandpass over [f0−fc, f0+fc]; odd orders exercise the
    two-distinct-real-poles SOS pairing on real input."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=8192).astype(np.float32)
    sos = prototype_sos(ftype, order, 0.03, f0=0.12, ap=1.0, as_db=40.0)
    got = run_cascade(sos, x, complex_input=False)
    want = sig.sosfilt(sos, x.astype(np.float64))
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(got - want)) / scale < 5e-3, (ftype, order)


def test_bandpass_selects_band():
    """End-to-end through the Block API: a cheby1 bandpass at f0=0.2 passes a
    0.2-cycle tone and rejects 0.05 / 0.35."""
    n = 1 << 14
    t = np.arange(n)
    blk = cs.iir_cfilter(5, 0.02, f0=0.2, ap=0.5, as_db=60.0, ftype="cheby1")
    pipe = Pipeline(blk, block_size=n, donate=False)

    def power(f):
        x = np.exp(2j * np.pi * np.mod(f * t, 1.0)).astype(np.complex64)
        sink = cs.CollectSink()
        pipe.reset()
        pipe.run(iter([x]), sink)
        y = np.asarray(sink.concat())[n // 2:]
        return float(np.mean(np.abs(y) ** 2))

    p_pass, p_lo, p_hi = power(0.2), power(0.05), power(0.35)
    assert p_pass > 0.5
    assert p_lo < 1e-4 * p_pass
    assert p_hi < 1e-4 * p_pass


def test_wbfm_deemph_unchanged():
    """The CLI's only IIR use (order-2 Butterworth de-emphasis) must be
    byte-compatible with round 1's butter_sos design."""
    from csdr_tpu.utils.iirdes import butter_sos

    assert np.allclose(prototype_sos("butter", 2, 0.04), butter_sos(2, 0.04))


def test_prototype_errors():
    with pytest.raises(ValueError, match="unknown IIR prototype"):
        prototype_sos("elliptic", 4, 0.1)
    with pytest.raises(ValueError, match="bandpass edges"):
        prototype_sos("butter", 4, 0.2, f0=0.4)  # f0+fc ≥ 0.5
    with pytest.raises(ValueError):
        prototype_sos("butter", 4, 0.7)


def test_complex_typed_real_pole_bandpass():
    """Wide odd-order bandpass designs produce SOS sections with two distinct
    REAL poles, handed to linrec as complex-typed scalars with zero imag —
    these must not crash (regression: float() of a complex raised TypeError
    in both the serial and sharded paths)."""
    import scipy.signal as sig

    import csdr_tpu as cs
    from csdr_tpu.utils.iirdes import prototype_sos

    blk = cs.iir_cfilter(1, 0.1, f0=0.15)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(np.complex64)
    _, y = blk.apply(blk.init(), x)
    ref = sig.sosfilt(prototype_sos("butter", 1, 0.1, f0=0.15),
                      x.astype(np.complex128))
    assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 1e-3

    import jax
    from jax.sharding import Mesh

    from csdr_tpu.core.runtime import decode_tree_host
    from csdr_tpu.parallel import ShardedChain

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("time", "ch"))
    sc = ShardedChain(cs.iir_cfilter(1, 0.1, f0=0.15), mesh, 8192)
    _, ys = sc.step(sc.init(), x)
    assert np.max(np.abs(decode_tree_host(ys) - np.asarray(y))) < 2e-3
