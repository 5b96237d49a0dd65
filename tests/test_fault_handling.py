"""Failure-path semantics (reference: SoapyException + bracketIO teardown,
Common.hs:32-52; read-timeout → graceful stream end, Source.chs:226-233)."""

import numpy as np
import pytest

import csdr_tpu as cs
from csdr_tpu.core.runtime import Pipeline
from csdr_tpu.io import wav as wavio


def test_sink_teardown_on_source_failure(tmp_path):
    """A source that raises mid-stream must not corrupt the sink: the
    context-manager teardown (our bracketIO) patches the WAV header for the
    samples already written."""
    p = str(tmp_path / "partial.wav")

    def bad_source():
        yield np.ones(4096, np.complex64)
        yield np.ones(4096, np.complex64)
        raise IOError("device vanished")

    pipe = Pipeline(cs.fm_demodulator(0.6), block_size=4096)
    sink = cs.AudioFileSink(p[:-4], 48000, 1, "wav")
    with pytest.raises(IOError):
        with sink:
            pipe.run(bad_source(), sink)
    audio, sr = wavio.read_wav(p)
    assert sr == 48000
    assert len(audio) >= 4096  # what was drained before the failure survives


def test_sdr_timeout_ends_stream_gracefully():
    """SdrSource.read() returning None ends the pipeline without error
    (the reference's 1 s timeout semantics)."""
    class Flaky(cs.SdrSource):
        def __init__(self):
            self.n = 0

        def read(self):
            self.n += 1
            if self.n > 3:
                return None  # timeout
            return np.ones(1000, np.complex64)

    total = sum(len(c) for c in Flaky())
    assert total == 3000


def test_wav_source_rejects_stereo(tmp_path):
    p = str(tmp_path / "st.wav")
    wavio.write_wav(p, np.zeros((100, 2), np.float32), 8000)
    with pytest.raises(ValueError):
        list(cs.wav_iq_source(p))


def test_unknown_sdr_driver():
    with pytest.raises(KeyError):
        cs.open_sdr("rtlsdr_not_here", 1e6, 1e8, 0.0)
