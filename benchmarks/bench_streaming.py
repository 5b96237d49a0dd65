"""End-to-end streaming benchmark: file → host feed → device graph → sinks.

This is the honest production number (bench.py measures device-resident
kernel throughput): it includes host→device transfer, the native IO runtime,
and per-channel file writes — the analogue of the reference's 20-channel
split workload (README.md:184-195: 1.6 MSPS real-time on CPU).

Usage: python benchmarks/bench_streaming.py [n_samples] [nch]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import csdr_tpu as cs
    from csdr_tpu.models.receivers import channelized_fm_receiver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 25  # 33.5 MS
    nch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    with tempfile.TemporaryDirectory() as td:
        cap = os.path.join(td, "cap.cf32")
        rng = np.random.default_rng(0)
        chunk = 1 << 22
        with open(cap, "wb") as f:
            t0 = 0
            for _ in range(n // chunk):
                t = np.arange(t0, t0 + chunk)
                x = (0.5 * np.exp(2j * np.pi * np.mod(0.1237 * t, 1.0))
                     + 0.05 * (rng.standard_normal(chunk) + 1j * rng.standard_normal(chunk)))
                x.astype(np.complex64).tofile(f)
                t0 += chunk

        graph = channelized_fm_receiver(nch, kf=0.6, backend="pallas")
        pipe = cs.Pipeline(graph, block_size=1 << 21)

        try:
            from csdr_tpu.io.native import NativeRawFileSink as Sink
            from csdr_tpu.io.native import native_cf32_source as src_fn
            native = True
        except Exception:
            Sink = cs.RawFileSink
            src_fn = cs.cf32_file_source
            native = False

        sink = cs.ChannelFileSinks(
            lambda i: Sink(os.path.join(td, f"out_ch{i + 1}.f32")), nch)

        t0 = time.perf_counter()
        total = pipe.run(src_fn(cap, 1 << 20), sink)
        sink.close()
        dt = time.perf_counter() - t0

        msps = n / dt / 1e6
        print(json.dumps({
            "metric": "streaming_end_to_end_pfb64_fm",
            "value": round(msps, 2),
            "unit": "Msamples/s",
            "native_io": native,
            "output_samples_per_channel": total,
            "vs_baseline": round(msps / 1.6, 2),  # reference real-time figure
        }))


if __name__ == "__main__":
    main()
