"""Native C++ threaded IO runtime."""

import numpy as np
import pytest

from csdr_tpu.io import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def test_native_reader_roundtrip(tmp_path):
    p = str(tmp_path / "x.cf32")
    x = (np.arange(100000) + 1j * np.arange(100000)).astype(np.complex64)
    x.tofile(p)
    got = np.concatenate(list(native.native_cf32_source(p, chunk_samples=7777)))
    assert np.array_equal(got, x)


def test_native_reader_empty(tmp_path):
    p = str(tmp_path / "e.cf32")
    open(p, "wb").close()
    assert list(native.native_cf32_source(p)) == []


def test_native_writer_roundtrip(tmp_path):
    p = str(tmp_path / "w.cf32")
    x = np.random.default_rng(0).normal(size=50000).astype(np.float32)
    with native.NativeRawFileSink(p) as sink:
        for i in range(0, 50000, 9999):
            sink(x[i:i + 9999])
    got = np.fromfile(p, dtype=np.float32)
    assert np.array_equal(got, x)


def test_native_missing_file():
    with pytest.raises(FileNotFoundError):
        list(native.native_cf32_source("/nonexistent/file.cf32"))
