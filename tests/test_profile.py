"""Per-block profiling (Pipeline(profile=True) / CLI --profile) — the
per-stage samples/s counter the reference lacks (SURVEY.md §5: its only
observability is static `_print` config dumps)."""

import numpy as np

import csdr_tpu as cs
from csdr_tpu.core.runtime import Pipeline, decode_tree_host
from csdr_tpu.utils import testsig


def _wbfm_graph():
    return cs.chain(cs.dc_blocker(), cs.fm_demodulator(0.6),
                    cs.fir_decimator(4))


def _fm_iq(n, f=0.01, kf=0.6):
    msg = 0.4 * np.sin(2 * np.pi * f * np.arange(n)).astype(np.float32)
    return testsig.fm_mod(msg, kf)


def test_profiled_pipeline_matches_unprofiled():
    """Profiling mode splits the graph into per-stage jits; the output must
    be bit-identical to the fused single-jit path."""
    n = 1 << 14
    iq = _fm_iq(n)
    plain = Pipeline(_wbfm_graph(), block_size=4096)
    prof = Pipeline(_wbfm_graph(), block_size=4096, profile=True)
    outs_a = [np.asarray(decode_tree_host(plain.process_block(iq[i:i + 4096])))
              for i in range(0, n, 4096)]
    outs_b = [np.asarray(decode_tree_host(prof.process_block(iq[i:i + 4096])))
              for i in range(0, n, 4096)]
    assert np.array_equal(np.concatenate(outs_a), np.concatenate(outs_b))


def test_profile_stats_and_report():
    n = 1 << 14
    iq = _fm_iq(n)
    pipe = Pipeline(_wbfm_graph(), block_size=4096, profile=True)

    class Sink:
        def __call__(self, y):
            pass

    total = pipe.run(iter([iq]), Sink())
    assert total == n // 4
    assert len(pipe.stage_stats) == 3
    for st, rate in zip(pipe.stage_stats, (1, 1, 1)):
        # 4 steady-state calls after the compile call (n / block_size = 4)
        assert st.calls == 4
        assert st.samples == (st.calls - 1) * 4096  # first call = compile
        assert st.compile_seconds > 0
    rep = pipe.profile_report()
    assert "MSPS_in" in rep and "dc_blocker" in rep and "TOTAL" in rep


def test_cli_profile_flag(tmp_path, capsys, monkeypatch):
    from csdr_tpu.apps.soapy_sdr_cli import main as cli_main

    monkeypatch.chdir(tmp_path)
    n = 1 << 14
    iq = _fm_iq(n)
    iq.astype(np.complex64).tofile("in.cf32")
    rc = cli_main(["--filename", "in.cf32", "-s", "256000", "-n", str(n),
                   "--demod", "DeWBFM 4 WAV", "-o", "out", "--profile",
                   "--blocksize", "4096"])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "Per-stage budget" in outp and "pct" in outp
