"""bench.run_scan correctness: the on-device scan-loop benchmark must compute
exactly what host-loop stepping computes (same carried state, same outputs) —
otherwise its throughput number measures a different program.

The scan-loop mode exists because the relay-tunneled chip's dispatch latency
swings ~50x between health regimes (docs/PERF.md §4): one dispatch executing
``inner`` state-chained steps inside ``lax.scan`` amortizes that latency away,
which is also what a production deployment's async dispatch pipelining does.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import bench
from csdr_tpu.core.runtime import CEnc, decode_tree, encode_tree
from csdr_tpu.models.receivers import channelized_fm_receiver

BLOCK = 1 << 16
TILEF = 128


@pytest.fixture(autouse=True)
def _small_block(monkeypatch):
    monkeypatch.setattr(bench, "_BLOCK", BLOCK)
    monkeypatch.setenv("CSDR_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("backend", ["pallas_full", "pallas", "cu8"])
def test_run_scan_executes(backend):
    msps = bench.run_scan(backend, outer=1, inner=2, tileF=TILEF)
    assert msps > 0


def test_run_scan_rejects_xla():
    with pytest.raises(ValueError, match="fused backends"):
        bench.run_scan("xla", 1, 1)


def test_scan_matches_host_loop():
    """State after N scan iterations == state after N host-loop steps, and
    the carried probe equals the last output's first element."""
    n_steps = 4
    graph = channelized_fm_receiver(64, kf=0.6, backend="pallas_full",
                                    tileF=TILEF)
    # deterministic non-trivial input (constant input demods to zero)
    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((BLOCK, 2)).astype(np.float32) * 0.3
    x = CEnc(jnp.asarray(x_np))

    def one(s_enc, x_enc):
        s2, y = graph.apply(decode_tree(s_enc), decode_tree(x_enc))
        return encode_tree(s2), encode_tree(y)

    one_j = jax.jit(one)
    s_loop = jax.jit(lambda: encode_tree(graph.init()))()
    for _ in range(n_steps):
        s_loop, y_loop = one_j(s_loop, x)

    def chunk(state, probe, xx):
        def body(carry, _):
            st, pr = carry
            st2, y = one(st, xx)
            arr = jax.tree.leaves(y)[0]
            return (st2, arr.reshape(-1)[0].astype(jnp.float32) + 0.0 * pr), None
        return jax.lax.scan(body, (state, probe), None, length=n_steps)[0]

    s0 = jax.jit(lambda: encode_tree(graph.init()))()
    s_scan, probe = jax.jit(chunk)(s0, jnp.float32(0.0), x)

    for a, b in zip(jax.tree.leaves(s_loop), jax.tree.leaves(s_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_first = np.asarray(jax.tree.leaves(y_loop)[0]).reshape(-1)[0]
    assert float(probe) == pytest.approx(float(y_first), abs=1e-7)
    assert abs(float(probe)) > 0  # non-trivial signal: probe really is live
